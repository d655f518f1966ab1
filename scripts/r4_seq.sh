#!/usr/bin/env bash
# Round-4 hardware sequence AFTER the N=100k record run frees the chip:
# compiled smoke (new codec/fused/compile-cache paths), the committee
# accuracy frontier sweep (VERDICT r3 item 2), the joint-committee scale
# point (item 4), and the headline bench.  Journaled like
# scripts/hw_supervisor.sh: done-markers under /tmp/gpis_r4, one TPU
# client at a time (waits for the record run to finish first).
#
# Usage: setsid nohup bash scripts/r4_seq.sh > /tmp/gpis_r4/seq.log 2>&1 &
set -u
REPO=/root/repo
HW=/tmp/gpis_r4
mkdir -p "$HW"
echo $$ > "$HW/seq.pid"
cd "$REPO"

ts() { date -u +"%H:%M:%S"; }
log() { echo "[$(ts)] $*"; }

# 1. Wait for the record run (it prints one final JSON line with "metric").
WAIT_LOG=${GPIS_WAIT_LOG:-/tmp/ooc100k_rec.log}
while [ -f "$WAIT_LOG" ] && ! grep -q '"metric"\|rc=' "$WAIT_LOG"; do
  log "waiting for the 100k record run ($WAIT_LOG)..."
  sleep 120
done
log "record run done: $(tail -1 "$WAIT_LOG" 2>/dev/null | head -c 300)"

probe() {
  timeout 300 python - <<'EOF' >/dev/null 2>&1
import jax
d = jax.devices()[0]
assert d.platform != "cpu", d
import jax.numpy as jnp
x = jnp.ones((256, 256), jnp.float32)
assert abs(float((x @ x)[0, 0]) - 256.0) < 1e-3
EOF
}

wait_for_tunnel() {
  until probe; do log "tunnel down; probing again in 10 min"; sleep 600; done
}

MAX_STEP_FAILS=2
run_step() {
  local name=$1 tmo=$2; shift 2
  [ -f "$HW/done.$name" ] && { log "skip $name (done)"; return 0; }
  local fails=0
  [ -f "$HW/fails.$name" ] && fails=$(cat "$HW/fails.$name")
  if [ "$fails" -ge "$MAX_STEP_FAILS" ]; then log "give up $name"; return 0; fi
  wait_for_tunnel
  log "START $name: $*"
  if timeout "$tmo" "$@" > "$HW/$name.log" 2>&1; then
    touch "$HW/done.$name"; log "DONE $name"
  else
    echo $((fails + 1)) > "$HW/fails.$name"
    log "FAIL $name (rc=$?, attempt $((fails + 1)))"; sleep 120
  fi
}

# 2. Compiled smoke: validates the int16 codec, fused query, and the
#    compile-cache cross-process hit on the real chip.
run_step smoke 3000 env GPIS_TEST_PLATFORM=tpu python -m pytest -m tpu -q

# 3. Committee frontier at N=100k (warm numbers; each new (E,B) shape
#    pays one-time compiles).  CPU probe at 16k (ROUND_NOTES r4): patch
#    SIZE dominates (E=8 1.67e-3 < E=16 2.43e-3 << E=32 1.12e-2), halo
#    helps, and ls=1.0/noise=1e-4 beats ls=0.4 — sweep bigger experts.
run_step expA 3300 env EXPERTS_WARM=1 \
  python bench/experts_scale.py 100000 16 64 8
run_step expB 3300 env EXPERTS_WARM=1 EXPERTS_HALO=1024 \
  python bench/experts_scale.py 100000 16 64 8
run_step expC 4500 env EXPERTS_WARM=1 \
  python bench/experts_scale.py 100000 8 64 8
run_step expD 4500 env EXPERTS_WARM=1 EXPERTS_HALO=2048 \
  python bench/experts_scale.py 100000 8 64 8

# 4. Joint committee scale point (config 2 x EP, VERDICT item 4).
run_step expJoint 4500 env EXPERTS_WARM=1 \
  EXPERTS_NORMALS=1 python bench/experts_scale.py 32768 16 64 16

# 5. Headline bench (provenance-stamped line; stale-rev flags visible).
run_step bench16k 1200 python bench.py

# 6. OPTIONAL (time-permitting): one measured full-data stream-hyperopt
#    step at the judge N (VERDICT r3 item 9) — one OOC factor + TRSM +
#    one streamed W gradient pass.
run_step stream100k 10800 env OOC_PANEL=2048 \
  python bench/stream_step_100k.py 100000 2048

log "ALL STEPS COMPLETE"
