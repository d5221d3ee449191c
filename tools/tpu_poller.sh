#!/bin/bash
# Poll for the axon TPU backend's return from the r3 s6/s7 outage; the
# moment a probe succeeds, run the parked measurement queue
# (tools/tpu_return_queue.sh). Designed to sit in a tmux session for
# hours. While this runs, NOTHING else may touch the TPU (CLAUDE.md:
# one TPU process at a time) — all concurrent work must force CPU.
#
# Usage: bash tools/tpu_poller.sh [poll_log] [queue_log]
set -u
cd "$(dirname "$0")/.."
POLL_LOG=${1:-/tmp/tpu_poll.log}
QUEUE_LOG=${2:-TPU_QUEUE_RUN.log}
export PYTHONPATH=/root/.axon_site:/root/repo${PYTHONPATH:+:$PYTHONPATH}
export JAX_PLATFORMS=axon

# safety TTL: stop probing after this many seconds (default 8h) so an
# orphaned poller from an ended session can never start a queue that
# contends with a LATER session's TPU use (CLAUDE.md: one process)
TTL=${TPU_POLLER_TTL_S:-28800}
DEADLINE=$(( $(date +%s) + TTL ))

echo "$(date -u +%F\ %T) poller start (ttl ${TTL}s)" >> "$POLL_LOG"
while true; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "$(date -u +%F\ %T) TTL reached — giving up without a queue run" >> "$POLL_LOG"
    exit 1
  fi
  # a downed backend HANGS on init rather than erroring (bench watchdog
  # note) — bound the probe; a live backend answers in seconds and the
  # tiny matmul proves dispatch works, not just discovery
  if timeout 300 python - >> "$POLL_LOG" 2>&1 <<'EOF'
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128, 128), jnp.bfloat16)
(x @ x).block_until_ready()
print("probe ok:", d)
EOF
  then
    echo "$(date -u +%F\ %T) TPU BACK — starting queue" >> "$POLL_LOG"
    bash tools/tpu_return_queue.sh "$QUEUE_LOG"
    rc=$?  # capture BEFORE the echo: $(date) in the same word clobbers $?
    echo "$(date -u +%F\ %T) queue finished rc=$rc" >> "$POLL_LOG"
    break
  fi
  echo "$(date -u +%F\ %T) still down" >> "$POLL_LOG"
  sleep 240
done
