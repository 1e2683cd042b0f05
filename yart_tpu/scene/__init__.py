# Host-side scene compiler: meshes, materials, lights, BVH -> flat device arrays.
from yart_tpu.scene.types import CompiledScene, MaterialTable, SceneMeta  # noqa: F401
from yart_tpu.scene.builder import SceneBuilder  # noqa: F401
