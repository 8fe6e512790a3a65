"""Checkpointing via orbax.

The reference snapshots TF ``.ckpt`` files every SNAPSHOT_ITERS and at the
end of training (train_bus.py:131-173,788-790,954-955), named
``<prefix><infix>_fast_rcnn_iter_N.ckpt``; checkpoints are consumed only by
test.py (no mid-training resume exists there).  Here we keep the naming
convention, save the full train state (variables + optimizer + step), and
ADD a resume path.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _ckpt_dir(output_dir: str, prefix: str, infix: str, step: int) -> str:
    return os.path.join(os.path.abspath(output_dir),
                        f"{prefix}{infix}_iter_{step}")


def save_checkpoint(output_dir: str, prefix: str, infix: str, step: int,
                    variables, opt_state, opt_state_ws=None,
                    host_state: Optional[dict] = None,
                    checkpointer=None) -> str:
    """``opt_state_ws``: the alternating regime's second optimizer state.
    ``host_state``: picklable host-side training state (LR-schedule state,
    RNG streams, loss logs) so --resume continues the exact trajectory.

    ``checkpointer``: a caller-owned ``orbax.checkpoint.StandardCheckpointer``
    for OVERLAPPED writes — the tensor writes proceed on orbax's background
    threads while training continues, and only the next save (or the
    caller's ``wait_until_finished``) blocks on them.  At most one snapshot
    is in flight: this function first waits out the previous one.  Without
    it a one-shot checkpointer is used and the write is synchronous."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(output_dir, prefix, infix, step)
    sync = checkpointer is None
    ckptr = ocp.StandardCheckpointer() if sync else checkpointer
    if not sync:
        ckptr.wait_until_finished()  # bound in-flight snapshots to one
    state = {"variables": variables,
             "step": np.asarray(step, dtype=np.int64)}
    ckptr.save(os.path.join(path, "variables"), state, force=True)
    if opt_state is not None:
        ckptr.save(os.path.join(path, "opt_state"), opt_state, force=True)
    if opt_state_ws is not None:
        ckptr.save(os.path.join(path, "opt_state_ws"), opt_state_ws,
                   force=True)
    if sync:
        ckptr.wait_until_finished()
    if host_state is not None:
        import pickle

        with open(os.path.join(path, "host_state.pkl"), "wb") as f:
            pickle.dump(host_state, f, pickle.HIGHEST_PROTOCOL)
    return path


def load_checkpoint(path: str, variables_like, opt_state_like=None,
                    opt_state_ws_like=None):
    """Restore (variables, step[, opt_state][, opt_state_ws]) from a
    snapshot directory."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tmpl = {"variables": variables_like, "step": np.asarray(0, dtype=np.int64)}
    state = ckptr.restore(os.path.join(os.path.abspath(path), "variables"),
                          tmpl)
    out = [state["variables"], int(state["step"])]
    if opt_state_like is not None:
        out.append(ckptr.restore(
            os.path.join(os.path.abspath(path), "opt_state"), opt_state_like))
    if opt_state_ws_like is not None:
        ws_path = os.path.join(os.path.abspath(path), "opt_state_ws")
        out.append(ckptr.restore(ws_path, opt_state_ws_like)
                   if os.path.isdir(ws_path) else None)
    return tuple(out)


def load_host_state(path: str) -> Optional[dict]:
    p = os.path.join(os.path.abspath(path), "host_state.pkl")
    if not os.path.exists(p):
        return None
    import pickle

    with open(p, "rb") as f:
        return pickle.load(f)


def _is_complete(path: str) -> bool:
    """A snapshot directory is resumable iff its tensor saves finalized:
    orbax writes into ``*.orbax-checkpoint-tmp-*`` staging dirs and renames
    on completion, so a crash mid-write (sync or overlapped) leaves the
    staging name behind and/or no ``variables`` dir."""
    if not os.path.isdir(os.path.join(path, "variables")):
        return False
    return not any("orbax-checkpoint-tmp" in n for n in os.listdir(path))


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Newest COMPLETE snapshot in ``output_dir`` (half-written snapshots
    from an interrupted run are skipped, falling back to the previous one)."""
    if not os.path.isdir(output_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(output_dir):
        if "_iter_" not in name:
            continue
        try:
            step = int(name.rsplit("_iter_", 1)[1])
        except ValueError:
            continue
        path = os.path.join(output_dir, name)
        if step > best_step and os.path.isdir(path) and _is_complete(path):
            best, best_step = path, step
    return best
