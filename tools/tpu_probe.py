"""One-shot TPU relay health probe.

Initializes the backend, runs a tiny matmul, syncs by scalar readback (the
axon relay's ``block_until_ready`` does not block), and prints ONE JSON
line: {"ok": bool, "init_s": ..., "matmul_ms": ..., "error": "..."}.

Operational context: the tunneled relay serves one client; a client killed
mid-operation can leave the relay refusing backend setup for an extended
period (observed round 5: every init attempt then blocks ~25 min before
failing UNAVAILABLE).  Pipeline drivers call this with a short timeout
before starting expensive stages instead of burning a 25-minute failure
inside the stage itself.  No reference analog (single-process CUDA).

  timeout 120 python tools/tpu_probe.py || echo relay unhealthy
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fail_fast_register(claim_s: int) -> None:
    """Manual axon registration with a short claim timeout.

    The baked sitecustomize registers with server-default claim timeout,
    so a wedged terminal session makes every init attempt block ~25 min.
    Launch the probe with PALLAS_AXON_POOL_IPS unset and
    WAVEDM_PROBE_CLAIM_S=<seconds> to fail fast instead:

      env -u PALLAS_AXON_POOL_IPS WAVEDM_PROBE_CLAIM_S=120 \
          python tools/tpu_probe.py
    """
    import uuid

    os.environ["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
    os.environ["AXON_LOOPBACK_RELAY"] = "1"
    os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    from axon.register import register
    register(None, f"{gen}:1x1x1", so_path="/opt/axon/libaxon_pjrt.so",
             session_id=str(uuid.uuid4()), remote_compile=True,
             claim_timeout_s=claim_s)
    os.environ["JAX_PLATFORMS"] = "axon"


def main():
    t0 = time.time()
    out = {"ok": False, "init_s": None, "matmul_ms": None, "error": ""}
    try:
        from wavedm_tpu.utils.tpu_lock import acquire_tpu_lock
        if not acquire_tpu_lock("tpu_probe", timeout=30):
            out["error"] = "device lock held (another client active)"
            print(json.dumps(out))
            return 2
        claim_s = os.environ.get("WAVEDM_PROBE_CLAIM_S")
        if claim_s and not os.environ.get("PALLAS_AXON_POOL_IPS"):
            _fail_fast_register(int(claim_s))
        import jax
        import jax.numpy as jnp
        dev = jax.devices()[0]
        out["init_s"] = round(time.time() - t0, 1)
        out["platform"] = dev.platform
        out["device"] = str(getattr(dev, "device_kind", dev))
        x = jnp.ones((512, 512), jnp.bfloat16)
        t1 = time.time()
        y = (x @ x).sum()
        val = float(jnp.asarray(y).ravel()[0])  # scalar sync through relay
        out["matmul_ms"] = round((time.time() - t1) * 1e3, 1)
        out["ok"] = bool(val == 512.0 * 512 * 512) or val > 0
        print(json.dumps(out))
        return 0 if out["ok"] else 1
    except Exception as e:  # noqa: BLE001 -- the whole point is to report it
        out["error"] = f"{type(e).__name__}: {e}"[:200]
        out["init_s"] = round(time.time() - t0, 1)
        print(json.dumps(out))
        return 1


if __name__ == "__main__":
    sys.exit(main())
