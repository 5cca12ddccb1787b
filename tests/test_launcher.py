"""Fail-fast heartbeat launcher (SURVEY.md §5 failure detection)."""

import os
import sys
import time

from rtgs_tpu.parallel.launcher import HEARTBEAT_ENV, launch


def _worker(code: str):
    return [sys.executable, "-c", code]


def test_all_ranks_succeed():
    rc = launch(_worker("import os; print(os.environ['JAX_PROCESS_ID'])"),
                num_processes=2, coordinator="localhost:0")
    assert rc == 0


def test_fail_fast_on_worker_death():
    """Rank 1 dies → rank 0 (sleeping forever) must be torn down quickly."""
    code = (
        "import os, time\n"
        "if os.environ['JAX_PROCESS_ID'] == '1':\n"
        "    raise SystemExit(3)\n"
        "time.sleep(600)\n")
    t0 = time.time()
    rc = launch(_worker(code), num_processes=2, coordinator="localhost:0",
                poll_s=0.2)
    assert rc == 1
    assert time.time() - t0 < 60  # nowhere near the sleep(600)


def test_fail_fast_on_stale_heartbeat():
    """A rank that beats once then hangs trips the heartbeat timeout."""
    code = (
        "import os, pathlib, time\n"
        f"pathlib.Path(os.environ['{HEARTBEAT_ENV}']).touch()\n"
        "time.sleep(600)\n")
    t0 = time.time()
    rc = launch(_worker(code), num_processes=2, coordinator="localhost:0",
                heartbeat_timeout=2.0, poll_s=0.2)
    assert rc == 1
    assert time.time() - t0 < 60
