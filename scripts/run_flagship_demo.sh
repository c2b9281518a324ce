#!/usr/bin/env bash
# Flagship-geometry on-chip training demo launcher (BASELINE configs #2/#3).
#
# The TPU is reached through a tunnel relay (127.0.0.1:8082) that can die
# host-side; when it is down ANY jax backend init hangs forever. This
# launcher polls the relay, launches training only once it is up, and
# relaunches on abnormal exit (training.resume_training=true makes
# restarts idempotent). Logs append to runs/flagship_demo/train.log.
set -u
cd "$(dirname "$0")/.."
LOG=runs/flagship_demo/train.log
mkdir -p runs/flagship_demo

relay_up() { timeout 2 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; }

echo "[launcher $(date -u +%FT%TZ)] waiting for TPU relay" | tee -a "$LOG"
ATTEMPTS=0
while true; do
  until relay_up; do sleep 60; done
  echo "[launcher $(date -u +%FT%TZ)] relay up, starting training (attempt $((++ATTEMPTS)))" | tee -a "$LOG"
  PYTHONPATH=/root/.axon_site:/root/repo timeout 21600 \
    python main.py --config scripts/flagship_demo.yaml >>"$LOG" 2>&1
  rc=$?
  echo "[launcher $(date -u +%FT%TZ)] training exited rc=$rc" | tee -a "$LOG"
  [ "$rc" -eq 0 ] && break
  [ "$ATTEMPTS" -ge 5 ] && { echo "[launcher] giving up after 5 attempts" | tee -a "$LOG"; break; }
  sleep 30
done

# Post-training (unattended): flagship mAP on the demo checkpoint, then the
# round's bench refresh (headline + streaming incl. the chunk4 row). Each
# guarded by a relay check and a timeout so a mid-run relay death cannot
# hang the launcher. Device lock serializes these — keep them sequential.
if [ -f runs/flagship_demo/exp/best.pt ]; then
  if relay_up; then
    echo "[launcher $(date -u +%FT%TZ)] running eval_2 on flagship best.pt" | tee -a "$LOG"
    PYTHONPATH=/root/.axon_site:/root/repo timeout 5400 \
      python eval_2.py --config scripts/flagship_demo.yaml \
      > runs/flagship_demo/eval2.log 2>&1
    echo "[launcher $(date -u +%FT%TZ)] eval_2 rc=$? (runs/flagship_demo/eval2.log)" | tee -a "$LOG"
  fi
  if relay_up; then
    # Visual evidence for the demo: overlay PNGs on the test split from
    # best.pt, stitched to mp4 (the reference's visualize + video.py flow).
    echo "[launcher $(date -u +%FT%TZ)] running visualize + video" | tee -a "$LOG"
    sed 's/^mode: .*/mode: "visualize"/' scripts/flagship_demo.yaml > /tmp/flagship_viz.yaml
    PYTHONPATH=/root/.axon_site:/root/repo timeout 3600 \
      python main.py --config /tmp/flagship_viz.yaml \
      > runs/flagship_demo/viz.log 2>&1
    echo "[launcher $(date -u +%FT%TZ)] visualize rc=$?" | tee -a "$LOG"
    PYTHONPATH=/root/.axon_site:/root/repo timeout 900 \
      python video.py --config /tmp/flagship_viz.yaml \
      --output runs/flagship_demo/exp/video/output.mp4 \
      >> runs/flagship_demo/viz.log 2>&1
    echo "[launcher $(date -u +%FT%TZ)] video rc=$?" | tee -a "$LOG"
  fi
  if relay_up; then
    echo "[launcher $(date -u +%FT%TZ)] running bench refresh" | tee -a "$LOG"
    PYTHONPATH=/root/.axon_site:/root/repo timeout 3600 \
      python bench.py > runs/flagship_demo/bench_headline.json 2> runs/flagship_demo/bench_headline.log
    echo "[launcher $(date -u +%FT%TZ)] bench rc=$?" | tee -a "$LOG"
    PYTHONPATH=/root/.axon_site:/root/repo timeout 3600 \
      python bench.py --streaming > runs/flagship_demo/bench_streaming.json 2> runs/flagship_demo/bench_streaming.log
    echo "[launcher $(date -u +%FT%TZ)] bench --streaming rc=$?" | tee -a "$LOG"
  fi
fi
echo "[launcher $(date -u +%FT%TZ)] all done" | tee -a "$LOG"
