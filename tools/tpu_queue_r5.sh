#!/usr/bin/env bash
# Round-5 real-chip measurement queue. The TPU tunnel was DOWN for the
# whole round-5 session (connection refused on 127.0.0.1:8082 from the
# first probe; no tpu_init process — per the verify skill that means the
# relay does not come back for the session). Everything below is built,
# CPU-validated and wired; run top to bottom the moment
#   timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082'
# connects. Each step tees to /tmp/tpu_queue_r5.log and persists its own
# artifacts, so a tunnel death mid-queue keeps earlier steps.
#
# ONE TPU process at a time; cold integrator compiles are 10-25 min;
# always run from the repo root (the axon plugin needs cwd here).
set -x
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue_r5.log

# 1. Headline bench with ALL the round-5 rows: cornell/atrium fwd+bwd now
#    run the staged-compaction diff scan ((4,2) caps from measured live
#    fractions); new atrium_ivy_fwdbwd / roadster_fwdbwd /
#    atrium_fwdbwd_rr rows. Targets (VERDICT r4): atrium_fwdbwd >= 2.0,
#    cornell_fwdbwd >= 18.
timeout 10800 python -u bench.py 2>&1 | tee -a $LOG

# 2. Quantized u16 re-key emask (bit-identical; kernels/pallas_fusedtrace
#    rekey_q16). Target: bigscene_closest_hit >= 5.9. If it loses,
#    record the number in BASELINE.md and keep the default off.
YART_TRACE_REKEY_Q16=1 timeout 7200 python -u bench.py 2>&1 | tee -a $LOG
# If step 2 beats step 1 on bigscene_closest_hit: flip TRACE_REKEY_Q16's
# default to "1" in render/blocktrace.py and commit with both numbers.

# 3. Roofline: fills ROOFLINE.json (cost_analysis bytes/flops vs v5e
#    peaks + VPU bound for the fused kernel); quote into BASELINE.md's
#    roofline section ("speed-of-light" becomes a measurement).
timeout 10800 python -u tools/roofline.py all 2>&1 | tee -a $LOG

# 4. Reference-resolution production render (VERDICT r4 #5): the
#    reference's exact 1920x1200 config class, >= 256 spp, GMoN,
#    checkpointing exercised (kill + resume mid-render to prove it, then
#    let it finish). Lane-budget chunking handles the big first wave.
timeout 28800 python -u -m yart_tpu.cli atrium-ivy \
  -o sample_renders/atrium_ivy_1920x1200.png --size 1920x1200 --spp 256 \
  --first-wave 16 --max-wave 64 --estimator gmon \
  --checkpoint /tmp/ivy_prod.npz 2>&1 | tee -a $LOG

# 5. Roadster caustic-speckle comparison at equal spp (VERDICT r4 #6):
#    baseline vs --regularize-specular 1. Compare p99.9 pixel luminance
#    (python - <<'EOF' snippet in BASELINE.md round-5 section) and commit
#    the better render + both numbers.
timeout 10800 python -u -m yart_tpu.cli roadster \
  -o sample_renders/roadster_r5_base.png --spp 96 --size 512x512 \
  --first-wave 32 --max-wave 32 2>&1 | tee -a $LOG
timeout 10800 python -u -m yart_tpu.cli roadster \
  -o sample_renders/roadster_r5_regspec.png --spp 96 --size 512x512 \
  --first-wave 32 --max-wave 32 --regularize-specular 1 2>&1 | tee -a $LOG

# 6. Per-wave autotune on-chip sanity: cornell must keep 22+, atrium 3.3
#    (the autotune only re-jits when it would change the decision, so
#    these are expected no-ops; the windowed-interior class is where it
#    pays). Confirm via step 1's bench rows — no separate run needed.

# 7. Tracer-leak canary on the axon runtime (the leak class was fixed
#    this round; verify the TPU path too).
YART_TPU=1 timeout 3600 python -u tools/diag_bufrepro.py 2>&1 | tee -a $LOG
