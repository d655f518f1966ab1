#!/usr/bin/env bash
# Round-5 unattended hardware campaign (one TPU client at a time).
#
# Sequence (journaled under /tmp/gpis_hw5; a restart skips finished steps):
#   1. smoke      — compiled -m tpu tier (validates the r5 kernels)
#   2. bench16k   — headline at the clean HEAD (r5 reference ~1.52 s)
#   3. floorprobe — committee quad-error floor law (B up to 13312)
#   4. ooc100k    — N=100k judge-config record at clean HEAD (resumable)
#   5. stream100k — process-split full-data hyperopt step at N=100,128
#   6. oocjoint   — config-2 joint OOC 16k record (provenance-stamped)
#   7. experts8   — E=8 committee at 100k (B=13312) with the retuned floor
#   8. bench_final— final headline so every attachment is stale-flag-free
#
# Usage: setsid nohup bash scripts/hw_r5.sh >/tmp/gpis_hw5/super.log 2>&1 &
# Stop:  kill $(cat /tmp/gpis_hw5/super.pid)    (PID only — never pkill)

set -u
REPO=/root/repo
HW=/tmp/gpis_hw5
OOC_DIR=/tmp/ooc_100k_r5
STEP_DIR=/tmp/stream_step_r5
DEADLINE=${GPIS_HW_DEADLINE:-$(( $(date +%s) + 8*3600 ))}
mkdir -p "$HW"
echo $$ > "$HW/super.pid"
cd "$REPO"

ts() { date -u +"%H:%M:%S"; }
log() { echo "[$(ts)] $*"; }

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
  while true; do
    [ "$(date +%s)" -ge "$DEADLINE" ] && { log "deadline passed; exiting"; exit 0; }
    probe; rc=$?
    if [ $rc -eq 0 ]; then log "tunnel HEALTHY"; return 0; fi
    if [ $rc -eq 124 ]; then log "probe HUNG (rc=124) — 30 min backoff"; sleep 1800
    else log "probe failed rc=$rc — 12 min backoff"; sleep 720; fi
  done
}

MAX_STEP_FAILS=3
run_step() {
  local name=$1 tmo=$2; shift 2
  [ -e "$HW/done.$name" ] && { log "skip $name (done)"; return 0; }
  [ -e "$HW/gaveup.$name" ] && { log "skip $name (gave up)"; return 0; }
  log "START $name: $*"
  timeout "$tmo" "$@" >"$HW/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then
    touch "$HW/done.$name"; log "DONE $name"; return 0
  fi
  log "FAIL $name rc=$rc (tail:)"; tail -3 "$HW/$name.log" | sed 's/^/    /'
  local fails=$(( $(cat "$HW/fails.$name" 2>/dev/null || echo 0) + 1 ))
  echo "$fails" > "$HW/fails.$name"
  if [ "$fails" -ge "$MAX_STEP_FAILS" ]; then
    touch "$HW/gaveup.$name"; log "GIVE UP on $name after $fails failures"
    return 0
  fi
  return $rc
}

attempt=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  attempt=$((attempt + 1))
  wait_for_tunnel

  run_step smoke 2700 env GPIS_TEST_PLATFORM=tpu python -m pytest -m tpu -q || { sleep 120; continue; }
  run_step bench16k 1200 python bench.py || { sleep 120; continue; }
  run_step floorprobe 3600 python bench/quad_floor_probe.py || { sleep 120; continue; }

  # 4. judge-config record at the clean HEAD (resumable; compile cache now
  #    serves the phase subprocesses, so retries skip the Mosaic compiles).
  if [ ! -e "$HW/done.ooc100k" ] && [ ! -e "$HW/gaveup.ooc100k" ]; then
    log "START ooc100k attempt $attempt (resumable, dir=$OOC_DIR)"
    OOC_PANEL=2048 timeout 14000 python bench.py --ooc 100000 "$OOC_DIR" >"$HW/ooc100k.attempt$attempt.log" 2>&1
    rc=$?
    tail -2 "$HW/ooc100k.attempt$attempt.log" | sed 's/^/    /'
    if [ $rc -eq 0 ] && grep -q '"ok": true' "$HW/ooc100k.attempt$attempt.log"; then
      touch "$HW/done.ooc100k"; log "DONE ooc100k"
    else
      ofails=$(( $(cat "$HW/fails.ooc100k" 2>/dev/null || echo 0) + 1 ))
      echo "$ofails" > "$HW/fails.ooc100k"
      if [ "$ofails" -ge 6 ]; then
        touch "$HW/gaveup.ooc100k"; log "GIVE UP on ooc100k after $ofails attempts"
      else
        log "ooc100k attempt rc=$rc — re-probing and resuming"
        sleep 120; continue
      fi
    fi
  fi

  # 5. process-split stream-hyperopt step at the judge N (VERDICT item 2).
  run_step stream100k 12000 python bench/stream_step_100k.py 100000 2048 "$STEP_DIR" || { sleep 120; continue; }

  # 6. config-2 joint OOC scale record, provenance-stamped this time.
  run_step oocjoint 7200 python bench/ooc_joint_scale.py 16384 || { sleep 120; continue; }

  # 7. committee with the measured floor: E=8 at 100k (the r4 frontier said
  #    patch size dominates — E=8 should beat 9.9e-4 once the floor stops
  #    binding; floor scale comes from the floorprobe step via env).
  if [ -e "$HW/done.floorprobe" ] && [ ! -e "$HW/done.experts8" ] && [ ! -e "$HW/gaveup.experts8" ]; then
    SCALE=$(python scripts/floor_scale_from_probe.py "$HW/floorprobe.log" 2>/dev/null || echo "")
    log "experts8 with GPIS_EXPERT_FLOOR_SCALE=${SCALE:-default}"
    if [ -n "$SCALE" ]; then
      EXPERTS_WARM=1 GPIS_EXPERT_FLOOR_SCALE=$SCALE timeout 3600 python bench/experts_scale.py 100000 8 >"$HW/experts8.log" 2>&1
    else
      EXPERTS_WARM=1 timeout 3600 python bench/experts_scale.py 100000 8 >"$HW/experts8.log" 2>&1
    fi
    if [ $? -eq 0 ] && grep -q '"ok": true' "$HW/experts8.log"; then
      touch "$HW/done.experts8"; log "DONE experts8"
    else
      efails=$(( $(cat "$HW/fails.experts8" 2>/dev/null || echo 0) + 1 ))
      echo "$efails" > "$HW/fails.experts8"
      [ "$efails" -ge 3 ] && { touch "$HW/gaveup.experts8"; log "GIVE UP experts8"; } || { sleep 120; continue; }
    fi
  fi

  # 8. final headline at the fully-committed HEAD.
  run_step bench_final 1200 python bench.py || { sleep 120; continue; }

  log "campaign complete"
  break
done
log "supervisor exiting"
