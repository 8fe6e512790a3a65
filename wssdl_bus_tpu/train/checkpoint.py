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


#: snapshot components, each written by its OWN orbax checkpointer so the
#: writes overlap each other (and, with caller-owned writers, training):
#: orbax's ``AsyncCheckpointer.save`` first waits out that checkpointer's
#: previous save, so queueing three components on one writer would block
#: the training thread on all but the last.
COMPONENTS = ("variables", "opt_state", "opt_state_ws")


def make_snapshot_writers() -> dict:
    """Per-component checkpointers for overlapped snapshot writes; pass to
    ``save_checkpoint(checkpointers=...)`` and wait with
    ``wait_snapshot_writers`` before consuming the snapshot."""
    import orbax.checkpoint as ocp

    return {c: ocp.StandardCheckpointer() for c in COMPONENTS}


def wait_snapshot_writers(writers: Optional[dict]) -> None:
    for w in (writers or {}).values():
        w.wait_until_finished()


def save_checkpoint(output_dir: str, prefix: str, infix: str, step: int,
                    variables, opt_state, opt_state_ws=None,
                    host_state: Optional[dict] = None,
                    checkpointers: Optional[dict] = None) -> str:
    """``opt_state_ws``: the alternating regime's second optimizer state.
    ``host_state``: picklable host-side training state (LR-schedule state,
    RNG streams, loss logs) so --resume continues the exact trajectory.

    ``checkpointers``: caller-owned per-component checkpointers (from
    ``make_snapshot_writers``) for OVERLAPPED writes — all tensor writes
    proceed on orbax's background threads while training continues; orbax
    itself serializes successive saves per component, bounding in-flight
    host copies.  Without them the write is synchronous.

    Write ordering makes crashes detectable by ``_is_complete``: the host
    pickle (which records WHICH tensor components this snapshot has) is
    written first via an atomic rename, then the tensor saves are queued;
    orbax finalizes each component directory by renaming its staging dir,
    so a snapshot whose flagged components all exist finalized is whole."""
    import pickle

    path = _ckpt_dir(output_dir, prefix, infix, step)
    os.makedirs(path, exist_ok=True)
    host_state = dict(host_state or {})
    host_state["components"] = ["variables"] + \
        (["opt_state"] if opt_state is not None else []) + \
        (["opt_state_ws"] if opt_state_ws is not None else [])
    tmp = os.path.join(path, "host_state.pkl.tmp")
    with open(tmp, "wb") as f:
        pickle.dump(host_state, f, pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, os.path.join(path, "host_state.pkl"))

    sync = checkpointers is None
    ckptrs = make_snapshot_writers() if sync else checkpointers
    state = {"variables": variables,
             "step": np.asarray(step, dtype=np.int64)}
    ckptrs["variables"].save(os.path.join(path, "variables"), state,
                             force=True)
    if opt_state is not None:
        ckptrs["opt_state"].save(os.path.join(path, "opt_state"), opt_state,
                                 force=True)
    if opt_state_ws is not None:
        ckptrs["opt_state_ws"].save(os.path.join(path, "opt_state_ws"),
                                    opt_state_ws, force=True)
    if sync:
        wait_snapshot_writers(ckptrs)
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
    """A snapshot directory is resumable iff EVERY tensor component it was
    written with finalized: orbax writes into ``*.orbax-checkpoint-tmp-*``
    staging dirs and renames on completion, so a crash mid-write (sync or
    overlapped) leaves a staging name behind and/or a missing component.
    The host pickle — written atomically BEFORE the tensor saves are
    queued — records the component list; a snapshot without one (or with
    a truncated one) predates that convention and is judged on the
    ``variables`` dir alone."""
    if not os.path.isdir(os.path.join(path, "variables")):
        return False
    if any("orbax-checkpoint-tmp" in n for n in os.listdir(path)):
        return False
    try:
        host = load_host_state(path)
    except Exception:
        return False  # truncated host pickle: mid-write crash
    for comp in (host or {}).get("components", []):
        if not os.path.isdir(os.path.join(path, comp)):
            return False
    return True


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
