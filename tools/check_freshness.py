"""Artifact-freshness gate: fail when a published measurement artifact
predates the last perf-relevant commit.

Rounds 3 and 4 both shipped stale claims (numbers measured on non-final
code; README asserting byte-identity at scales where the checked-in runs
disagreed).  This script makes that failure mode mechanical:

  * every measurement JSON (SCALE_r*.json, SCALING_r*.json,
    BASELINE_CPU.json, DEVICE_CHAIN_*.json) must carry a
    "source_commit" field;
  * the artifact is FRESH iff its source_commit is the current HEAD or
    an ancestor that is not older than the last commit touching
    perf-relevant paths (carpedeam_tpu/, bench.py, tools/);
  * README.md must not cite a round artifact older than the newest one
    present (e.g. quoting SCALE_r04 numbers when SCALE_r05.json exists).

Run manually or in CI: exit 0 = all claims backed by fresh artifacts.
`python tools/check_freshness.py --stamp FILE...` injects the current
HEAD into the named artifacts (use immediately after measuring).
"""
import glob
import json
import os
import re
import subprocess
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PERF_PATHS = ["carpedeam_tpu", "bench.py", "tools"]


def git(*args) -> str:
    return subprocess.run(["git", *args], cwd=_HERE, check=True,
                          capture_output=True, text=True).stdout.strip()


def last_perf_commit() -> str:
    return git("log", "-1", "--format=%H", "--", *PERF_PATHS)


def is_ancestor(a: str, b: str) -> bool:
    """True if commit a is an ancestor of (or equal to) b."""
    r = subprocess.run(["git", "merge-base", "--is-ancestor", a, b],
                       cwd=_HERE)
    return r.returncode == 0


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--stamp":
        head = git("rev-parse", "HEAD")
        for path in sys.argv[2:]:
            with open(path) as fh:
                d = json.load(fh)
            d["source_commit"] = head
            with open(path, "w") as fh:
                json.dump(d, fh, indent=1)
            print(f"stamped {path} -> {head[:12]}")
        return 0

    perf_head = last_perf_commit()
    print(f"last perf-relevant commit: {perf_head[:12]}")
    failures = []

    arts = sorted(glob.glob(os.path.join(_HERE, "SCALE_r*.json"))
                  + glob.glob(os.path.join(_HERE, "SCALING_r*.json"))
                  + glob.glob(os.path.join(_HERE, "DEVICE_CHAIN*.json"))
                  + glob.glob(os.path.join(_HERE, "BASELINE_CPU.json")))

    def round_no(p):
        m = re.search(r"_r(\d+)\.json$", p)
        return int(m.group(1)) if m else 0

    latest = {}
    for p in arts:
        fam = re.sub(r"_r\d+\.json$", "", os.path.basename(p))
        latest[fam] = max(latest.get(fam, 0), round_no(p))

    for p in arts:
        fam = re.sub(r"_r\d+\.json$", "", os.path.basename(p))
        if round_no(p) != latest[fam]:
            continue            # superseded artifacts are historical
        with open(p) as fh:
            d = json.load(fh)
        sc = d.get("source_commit")
        if not sc:
            failures.append(f"{os.path.basename(p)}: no source_commit "
                            "(stamp after measuring)")
            continue
        # fresh iff the perf-relevant head is an ancestor of the commit
        # the numbers were measured on (i.e. no perf commit came after)
        if sc != perf_head and not is_ancestor(perf_head, sc):
            failures.append(
                f"{os.path.basename(p)}: measured at {sc[:12]}, but "
                f"perf-relevant code changed at {perf_head[:12]} — "
                "re-measure or re-stamp")

    # README must cite the newest round artifacts present
    with open(os.path.join(_HERE, "README.md")) as fh:
        readme = fh.read()
    for fam, n in latest.items():
        if n == 0:
            continue
        for m in set(re.findall(fam + r"_r(\d+)", readme)):
            if int(m) < n:
                failures.append(
                    f"README.md cites {fam}_r{m} but {fam}_r{n}.json "
                    "exists — update the claims")

    if failures:
        print("\nSTALE ARTIFACTS:")
        for f in failures:
            print("  -", f)
        return 1
    print("all measurement artifacts fresh")
    return 0


if __name__ == "__main__":
    sys.exit(main())
