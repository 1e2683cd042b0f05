# Asset tooling: HDRI conversion etc.
