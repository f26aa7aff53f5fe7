"""Stall detection for blocking device fetches.

Remote-dispatch transports (the single-chip axon tunnel this repo is
driven over) can wedge server-side: an executable compiles, the dispatch
is accepted, and the result simply never materializes — a plain
jax.device_get then blocks forever with no error. fetch_with_timeout runs
the fetch on a daemon thread and bounds the wait, turning a silent hang
into a catchable DispatchStallError so the training loop can fall back
(e.g. to steps_per_dispatch=1) or abort loudly.

The reference has no analog (single-process CUDA never exhibits this);
this is TPU-runtime hardening per SURVEY §5 "failure detection".
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Optional


class DispatchStallError(RuntimeError):
    """A device fetch did not complete within the deadline."""


def fetch_with_timeout(tree: Any, timeout_s: float, what: str = 'device fetch',
                       _get: Optional[Callable] = None) -> Any:
    """jax.device_get(tree) bounded by timeout_s seconds.

    On timeout raises DispatchStallError; the fetch thread is a daemon and
    stays blocked (a wedged remote call cannot be cancelled from Python),
    so after a stall the caller must treat the involved buffers as lost.
    ``_get`` injects the fetch function (tests simulate stalls with a
    blocking stub)."""
    if _get is None:
        import jax
        _get = jax.device_get
    done = threading.Event()
    result: dict = {}

    def run():
        try:
            result['value'] = _get(tree)
        except BaseException as e:  # surfaced on the caller thread
            result['error'] = e
        finally:
            done.set()

    t = threading.Thread(target=run, daemon=True, name='fetch-watchdog')
    t.start()
    if not done.wait(timeout_s):
        raise DispatchStallError(
            f'{what} did not complete within {timeout_s:.0f}s — the device '
            'dispatch appears wedged (known axon-server failure mode for '
            'large multi-step executables)')
    if 'error' in result:
        raise result['error']
    return result['value']
