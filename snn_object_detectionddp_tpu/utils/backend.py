"""Timeout-guarded JAX backend probing.

A remote-TPU plugin whose tunnel is down blocks the first backend touch
(``jax.devices()``) FOREVER (observed repeatedly on this machine's 'axon'
link). Every unattended entry point — bench, the CLIs, the multichip
dryrun — must fail fast with a diagnosable message instead of hanging
the harness. This is the one shared implementation (previously
copy-pasted in bench.py and __graft_entry__.py).
"""

from __future__ import annotations


def probe_backend(timeout_s: float = 60.0) -> int | None:
    """Visible device count, or ``None`` if backend init did not complete
    within ``timeout_s`` (hung tunnel). The probe thread is a daemon: if
    it never returns it dies with the process."""
    import threading

    import jax

    probe: list = []
    t = threading.Thread(
        target=lambda: probe.append(len(jax.devices())), daemon=True
    )
    t.start()
    t.join(timeout=timeout_s)
    return probe[0] if probe else None


def require_backend(timeout_s: float = 120.0) -> int:
    """Fail fast (SystemExit with a clear message) when backend init
    hangs; returns the device count otherwise. CLI entry points call this
    right after config/device setup so an unattended run dies loudly in
    minutes, not silently forever."""
    n = probe_backend(timeout_s)
    if n is None:
        raise SystemExit(
            f"JAX backend init did not complete in {timeout_s:.0f}s — the "
            "accelerator plugin/tunnel is likely down. Restore it or set "
            "device: 'cpu' in the config to run on CPU."
        )
    return n
