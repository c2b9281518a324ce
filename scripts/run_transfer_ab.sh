#!/bin/bash
# Backbone-transfer A/B at flagship geometry on the hard fixture
# (VERDICT r4 next #3): three matched-budget 8-epoch runs —
#   fresh   : random init
#   init    : backbone_init from the round-4 flagship best.pt
#   freeze  : backbone_init + freeze_backbone
# then eval_2 on each best checkpoint. Sequential: the chip takes one
# process at a time. Logs to /tmp/transfer_<variant>.log.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:.
for v in fresh init freeze; do
  echo "=== transfer/$v train ==="
  python main.py --config "scripts/transfer_$v.yaml" \
    > "/tmp/transfer_${v}.log" 2>&1
  echo "=== transfer/$v eval ==="
  python eval_2.py --config "scripts/transfer_$v.yaml" \
    --weights "runs/transfer/$v/best.pt" \
    > "/tmp/transfer_${v}_eval.log" 2>&1
  tail -7 "/tmp/transfer_${v}_eval.log"
done
echo "transfer A/B complete"
