#!/usr/bin/env bash
# The pending real-chip measurement queue (the TPU tunnel died mid-round-2
# and stayed down for the continued session). Run top to bottom when
# `timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082'` connects; each step
# appends to /tmp/tpu_queue.log and persists its own artifacts, so a tunnel
# death mid-queue keeps everything finished so far.
#
# Compile-cache notes (memory/tpu-env-quirks): run ONE TPU process at a
# time; first compiles are 10-25 min cold; --max-wave == --first-wave
# avoids one compile per progressive doubling.
set -x
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue.log

# 1. Headline bench (bigscene/cornell/atrium sections; BENCH_DETAIL.json).
timeout 7200 python -u bench.py 2>&1 | tee -a $LOG

# 2. Fused shade path: cornell_mis_shade_{xla,pallas} vs cornell_mis.
#    If pallas wins, flip RenderConfig.shade_kernel's default and re-bench.
YART_BENCH_SHADE=1 timeout 10800 python -u bench.py 2>&1 | tee -a $LOG

# 3. Re-render the roadster (the committed sample image predates the wheel
#    orientation fix) and the atrium at flagship resolution.
timeout 10800 python -u -m yart_tpu.cli roadster -o sample_renders/roadster.png \
  --spp 96 --size 512x512 --first-wave 32 --max-wave 32 2>&1 | tee -a $LOG
timeout 14400 python -u -m yart_tpu.cli atrium -o sample_renders/atrium_1024.png \
  --spp 64 --size 1024x1024 --first-wave 16 --max-wave 16 2>&1 | tee -a $LOG

# 4. Instanced-atrium wave throughput (single-pass instanced fused kernel —
#    never measured on the chip).
timeout 7200 python -u -m yart_tpu.cli atrium-inst -o /tmp/atrium_inst.png \
  --spp 8 --size 256x256 --first-wave 8 --max-wave 8 2>&1 | tee -a $LOG

# 5. Shade-path wave profile (fusion table; feeds the next optimization).
timeout 7200 python -u tools/profile_wave.py cornell-mat 2>&1 | tee -a $LOG

# 6. Traversal shape ablation (cluster_size x block x kbatch) — winner goes
#    into YART_TRACE_BLOCK/YART_TRACE_KBATCH defaults + builder cluster_size.
timeout 14400 python -u tools/ablate_shape.py 2>&1 | tee -a $LOG
