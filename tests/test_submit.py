"""north_rule packaging check: the whole job ships via
``spark-submit --py-files`` (tools/submit.sh) and resumes from checkpoint."""

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(tmp_path):
    out = tmp_path / "crawl_out"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [
            os.path.join(REPO, "tools", "submit.sh"),
            "--master", "local[4]",
            "--fixture-tier", "tiny",
            "--out", str(out),
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-4000:]
    summary = json.load(open(out / "summary.json"))
    assert summary["fetched"] > 0 and summary["items"] > 0
    # outputs written by the job itself
    import pyarrow.parquet as pq

    listings = pq.read_table(str(out / "listings"))
    assert listings.num_rows == summary["items"]
    # seen holds deduped (url, seed_id) pairs; summary["inserted"] counts
    # per-wave new urls so re-inserts across waves make it an upper bound
    n_seen = pq.read_table(str(out / "seen")).num_rows
    assert 0 < n_seen <= summary["inserted"]
    assert pq.read_table(str(out / "metrics")).num_rows == summary["waves"]
