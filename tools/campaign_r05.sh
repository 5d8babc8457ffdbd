#!/bin/bash
# Round-5 final re-measurement campaign: every number regenerated from
# HEAD on an idle box, sequentially (no run overlaps another), so the
# freshness gate passes with honest stamps.  CPU first, then TPU.
set -x
cd /root/repo

# 1. reference-binary CPU baselines (fresh VM instance -> re-measure)
python tools/measure_baseline.py work/synth_120k.fq.gz --reps 3 \
    --json-out BASELINE_CPU.json
python tools/measure_baseline.py work/synth_1m.fq.gz --reps 2 \
    --json-out BASELINE_CPU_1M.json

# 2. SCALE pairs: mine vs reference, default flags, byte-compare
python tools/run_deep_config.py work/synth_120k.fq.gz --default-config \
    --json-out SCALE_PAIR_120k.json
python tools/run_deep_config.py work/synth_1m.fq.gz --default-config \
    --json-out SCALE_PAIR_1m.json

echo CAMPAIGN_CPU_DONE
