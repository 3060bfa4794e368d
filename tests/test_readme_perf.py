"""README perf-block freshness (VERDICT r03 weak #4).

`tools/gen_readme_perf.py` mechanically regenerates the README's measured
performance blocks from the recorded bench runs (BENCH_r*.json +
tools/bench_runs.jsonl).  The tool existing is not enough — nothing ran its
`--check` mode, so the README drifted one driver run after it landed.  This
test makes staleness a suite failure: whenever a new bench artifact lands,
`python tools/gen_readme_perf.py` must be re-run and the README committed.
"""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_perf_blocks_fresh():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "gen_readme_perf.py"),
         "--check"],
        capture_output=True, text=True, cwd=ROOT, timeout=120,
    )
    assert proc.returncode == 0, (
        "README.md perf blocks are stale relative to the recorded bench "
        "runs. Regenerate with `python tools/gen_readme_perf.py` and commit "
        f"README.md.\nstdout: {proc.stdout}\nstderr: {proc.stderr}"
    )
