"""The `ray job submit` deployment path (tools/job_build.py).

A submitted job is a driver subprocess with RAY_ADDRESS injected that owns
its session — exactly what this test spawns.  When the local cluster
exposes the job HTTP API (needs the dashboard, absent in this sandbox), the
same script is what `ray job submit --working-dir . -- python
tools/job_build.py ...` executes; the subprocess drive below covers the
identical code path minus the HTTP hop."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(args, env_extra=None):
    env = dict(os.environ, RAY_ADDRESS="local", PYTHONPATH=REPO)
    env.update(env_extra or {})
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "job_build.py"), *args],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_job_build_and_consolidate(tmp_path):
    from iresearch_ray.sources.transcripts import write_transcripts

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    write_transcripts(src, n_convs=120)

    m = _run_job(
        ["--src", src, "--out", idx, "--partitions", "4", "--consolidate", "count", "--gc"]
    )
    assert m["job"] == "build"
    assert m["docs"] > 0 and m["segments"] >= 1
    assert "consolidate_secs" in m and m["build_secs"] > 0

    # resume contract: a re-submitted job over the same input is a no-op
    # rebuild (completed partitions skipped via lineage), same doc count
    m2 = _run_job(["--src", src, "--out", idx, "--partitions", "4"])
    assert m2["docs"] == m["docs"]
