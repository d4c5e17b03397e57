"""Single-flight device lock (utils/tpu_lock.py).

Operational hardening for one-accelerator hosts: concurrent clients hang the
axon relay (no reference analog -- /root/reference assumes one process per
GPU).  Tests use a private lock path so they never touch the real one.
"""

import os
import subprocess
import sys
import time

from wavedm_tpu.utils.tpu_lock import acquire_tpu_lock, release_tpu_lock


def _env(path):
    e = dict(os.environ)
    e["WAVEDM_TPU_LOCK"] = str(path)
    e.pop("WAVEDM_TPU_LOCK_DISABLE", None)
    return e


def test_exclusion_and_handoff(tmp_path):
    lock = tmp_path / "dev.lock"
    ready = tmp_path / "ready"
    holder = subprocess.Popen(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, sys.argv[1]);"
         "from wavedm_tpu.utils.tpu_lock import acquire_tpu_lock;"
         "import time; assert acquire_tpu_lock('holder');"
         f"open({str(ready)!r}, 'w').write('1'); time.sleep(5)",
         os.path.dirname(os.path.dirname(os.path.abspath(__file__)))],
        env=_env(lock))
    try:
        for _ in range(100):
            if ready.exists():
                break
            time.sleep(0.1)
        assert ready.exists(), "holder never acquired"
        os.environ["WAVEDM_TPU_LOCK"] = str(lock)
        os.environ.pop("WAVEDM_TPU_LOCK_DISABLE", None)
        try:
            assert not acquire_tpu_lock("t", timeout=1, poll=0.2,
                                        verbose=False)
            assert acquire_tpu_lock("t", timeout=30, poll=0.2, verbose=False)
        finally:
            release_tpu_lock()
            os.environ.pop("WAVEDM_TPU_LOCK", None)
    finally:
        holder.wait()


def test_reentrant_and_disable(tmp_path):
    os.environ["WAVEDM_TPU_LOCK"] = str(tmp_path / "dev2.lock")
    try:
        assert acquire_tpu_lock("a", timeout=5, verbose=False)
        assert acquire_tpu_lock("a-again", timeout=0, verbose=False)
        release_tpu_lock()
        os.environ["WAVEDM_TPU_LOCK_DISABLE"] = "1"
        assert acquire_tpu_lock("noop", timeout=0, verbose=False)
    finally:
        os.environ.pop("WAVEDM_TPU_LOCK", None)
        os.environ.pop("WAVEDM_TPU_LOCK_DISABLE", None)
