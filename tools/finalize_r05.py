"""Fold the end-of-round-5 re-measurement outputs into the published
artifacts and apply transparent re-stamps.

Inputs (produced by tools/campaign_r05.sh + run_deep_config +
measure_coverage on THIS code):
  SCALE_PAIR_120k.json / SCALE_PAIR_1m.json  -> refresh SCALE_r05 rows
  DEEP_CONFIG_r05.json                       -> new deep-config row
  COVERAGE_r05_*.json                        -> referenced, left as-is

Re-stamps: rows/artifacts whose runs were NOT repeated this session
(the 5M tier, SCALING_r05, DEVICE_CHAIN_r05_1m) get source_commit HEAD
plus an explicit "restamp" block recording the commit the numbers were
measured at and why the intervening diff cannot change them — honesty
by disclosure, not by silent stamping.

Usage: python tools/finalize_r05.py
"""
import json
import os
import subprocess

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RESTAMP_NOTE = (
    "re-stamped at HEAD without re-running: measured at {mc}; "
    "`git diff {mc}..HEAD -- carpedeam_tpu/` is (a) params.copy_defaults "
    "flag-precedence (no effect: this run passes no overridden workflow "
    "flags), (b) a log-line RSS suffix active only at -v>=4, (c) "
    "bench-tool-only changes — none touch any compute path this number "
    "exercises; re-running was traded for the new deep-config/coverage "
    "measurements in the same wall-clock budget")


def head() -> str:
    return subprocess.run(["git", "rev-parse", "HEAD"], cwd=_HERE,
                          capture_output=True, text=True,
                          check=True).stdout.strip()


def load(p):
    with open(os.path.join(_HERE, p)) as fh:
        return json.load(fh)


def save(p, d):
    with open(os.path.join(_HERE, p), "w") as fh:
        json.dump(d, fh, indent=1)
    print(f"wrote {p}")


def main():
    h = head()

    # ---- SCALE_r05: refresh 120k/1M rows, keep 5M with restamp note --
    scale = load("SCALE_r05.json")
    for pair_file, row in (("SCALE_PAIR_120k.json", "synth_120k"),
                           ("SCALE_PAIR_1m.json", "synth_1m")):
        if not os.path.exists(os.path.join(_HERE, pair_file)):
            print(f"missing {pair_file}, skipping")
            continue
        pair = load(pair_file)
        r = scale["runs"][row]
        r["wall_s"] = pair["mine_wall_s"]
        r["reference_wall_s"] = pair["reference_wall_s"]
        r["speedup_vs_reference"] = round(
            pair["reference_wall_s"] / pair["mine_wall_s"], 2)
        r["vs_reference_fasta"] = pair["vs_reference_fasta"]
        r["mine_peak_rss_gb"] = pair["mine_peak_rss_gb"]
        r["reference_peak_rss_gb"] = pair["reference_peak_rss_gb"]
    mc = scale.get("source_commit", "")
    scale["runs"]["synth_5m_mock"]["restamp"] = \
        RESTAMP_NOTE.format(mc=mc[:12])
    if os.path.exists(os.path.join(_HERE, "DEEP_CONFIG_r05.json")):
        deep = load("DEEP_CONFIG_r05.json")
        scale["runs"]["deep_config_500k_mock"] = deep
    scale["source_commit"] = h
    scale["note"] = scale["note"].replace(
        "runs sequential", "re-measured from HEAD (except the 5M row, "
        "see its restamp field); runs sequential")
    save("SCALE_r05.json", scale)

    # ---- simple restamps with disclosure --------------------------------
    for art in ("SCALING_r05.json", "DEVICE_CHAIN_r05_1m.json"):
        d = load(art)
        mc = d.get("source_commit", "")
        d["restamp"] = RESTAMP_NOTE.format(mc=mc[:12])
        d["source_commit"] = h
        save(art, d)

    # ---- freshly measured artifacts: plain stamp ------------------------
    for art in ("BASELINE_CPU.json", "BASELINE_CPU_1M.json",
                "DEVICE_CHAIN_r05_120k.json", "GATHER_BENCH_r05.json",
                "KMER_HYBRID_r05.json", "DEEP_CONFIG_r05.json",
                "SCALE_PAIR_120k.json", "SCALE_PAIR_1m.json",
                "COVERAGE_r05.json", "COVERAGE_r05_1M_ladders.json"):
        p = os.path.join(_HERE, art)
        if not os.path.exists(p):
            continue
        d = load(art)
        d["source_commit"] = h
        save(art, d)


if __name__ == "__main__":
    main()
