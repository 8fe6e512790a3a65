"""Epoch-shuffled data layers with optional background prefetch.

Re-implements ``RoIDataLayer`` (``layer_bus.py:9-78``) and
``RoIDataLayerJoint`` (``layer_bus_joint.py:8-104``): independent shuffled
cursors per roidb, re-shuffled at epoch end during training and iterated in
order at test time.

Addition over the reference: a daemon prefetch thread (bounded queue) that
overlaps host-side decode/augment/pack with the device step — the reference's
``USE_PREFETCH`` flag exists but was never implemented (config.py:170-172).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.data.minibatch import get_minibatch, get_minibatch_joint


class _Cursor:
    def __init__(self, n: int, shuffle: bool, rng: np.random.RandomState):
        self.n = n
        self.shuffle = shuffle
        self.rng = rng
        self._reset()

    def _reset(self):
        self.perm = (self.rng.permutation(self.n) if self.shuffle
                     else np.arange(self.n))
        self.cur = 0

    def next(self, k: int) -> np.ndarray:
        if self.cur + k > self.n:
            self._reset()
        idx = self.perm[self.cur:self.cur + k]
        self.cur += k
        return idx

    def state_dict(self) -> dict:
        # no copy: perm is only ever REBOUND (_reset/load_state_dict), never
        # mutated in place, and under prefetch this runs after every draw
        return {"perm": self.perm, "cur": self.cur}

    def matches(self, sd: dict) -> bool:
        """Whether this saved state belongs to a roidb of our size (a
        mismatch means different splits or flip setting since the
        snapshot — restored indices would be wrong)."""
        return len(np.asarray(sd["perm"])) == self.n

    def load_state_dict(self, sd: dict) -> None:
        self.perm = np.asarray(sd["perm"]).copy()
        self.cur = int(sd["cur"])


def _concat_slots(blobs: list) -> dict:
    """Stack per-slot blob dicts contiguously along axis 0 — the global
    batch layout parallel.engine expects (slot i's images occupy rows
    [i*n_local, (i+1)*n_local))."""
    if len(blobs) == 1:
        return blobs[0]
    return {k: np.concatenate([b[k] for b in blobs], axis=0)
            for k in blobs[0]}


def _raw_canvas(*roidbs):
    """Static staging canvas for device-prep blobs: the max ORIGINAL image
    extent over the roidbs (ws rotation preserves size and cropping only
    shrinks), rounded up to a multiple of 8 for tidy device layout."""
    h = max(e["height"] for db in roidbs for e in db)
    w = max(e["width"] for db in roidbs for e in db)
    return (-(-h // 8) * 8, -(-w // 8) * 8)


def _slot_pool(slots: int):
    """Worker pool for parallel per-slot minibatch assembly.  The hot
    loops (imread, resize/rotate/photometric) run in native code or
    GIL-releasing numpy, so threads give real overlap; with 8 mesh slots a
    serial assembly would make host augmentation the training bottleneck."""
    return (ThreadPoolExecutor(max_workers=min(slots, 8),
                               thread_name_prefix="slotprep")
            if slots > 1 else None)


class RoIDataLayer:
    """Single-regime loader (supervised or weak).

    ``slots`` > 1 assembles a GLOBAL batch of ``slots`` contiguous per-slot
    minibatches for data-parallel training (each mesh data-slot gets the
    per-slot batch shape the single-device step handles)."""

    def __init__(self, roidb, net_name: str, cfg: Config, canvas_hw,
                 is_training: bool, is_ws: bool = False,
                 rng: np.random.RandomState = None, slots: int = 1,
                 device_prep: bool = False):
        self.roidb = roidb
        self.net_name = net_name
        self.cfg = cfg
        self.canvas_hw = canvas_hw
        self.is_training = is_training
        self.is_ws = is_ws
        self.rng = rng or np.random.RandomState(cfg.RNG_SEED)
        per = cfg.TRAIN.WS_IMS_PER_BATCH if is_ws else cfg.TRAIN.IMS_PER_BATCH
        self.ims_per_batch = per if is_training else 1
        self.slots = slots
        # device-prep staging layout (raw uint8 + params; ops/device_prep):
        # cuts the per-step host->device payload ~17x
        self.raw_hw = _raw_canvas(roidb) if device_prep else None
        self.cursor = _Cursor(len(roidb), is_training, self.rng)
        self._pool = _slot_pool(slots)

    def _forward_one(self):
        idx = self.cursor.next(self.ims_per_batch)
        batch = [self.roidb[i] for i in idx]
        return get_minibatch(batch, self.net_name, self.cfg, self.canvas_hw,
                             self.is_training, self.is_ws, self.rng,
                             raw_hw=self.raw_hw)

    def forward(self):
        if self.slots == 1:
            return self._forward_one()
        # cursor draws + per-slot RNG seeds happen serially (deterministic
        # under the layer's stream); the augmentation/packing fans out to
        # the pool with a private RandomState per slot (np RandomState is
        # not thread-safe)
        jobs = []
        for _ in range(self.slots):
            idx = self.cursor.next(self.ims_per_batch)
            jobs.append(([self.roidb[i] for i in idx],
                         np.random.RandomState(self.rng.randint(2 ** 31))))
        blobs = list(self._pool.map(
            lambda j: get_minibatch(j[0], self.net_name, self.cfg,
                                    self.canvas_hw, self.is_training,
                                    self.is_ws, j[1], raw_hw=self.raw_hw),
            jobs))
        return _concat_slots(blobs)

    def state_dict(self) -> dict:
        """Snapshot the draw state (shared RNG stream + cursor) right after
        a ``forward()``: restoring it makes the NEXT ``forward()`` produce
        exactly what an uninterrupted run would have produced."""
        return {"rng": self.rng.get_state(),
                "cursor": self.cursor.state_dict()}

    def load_state_dict(self, sd: dict) -> None:
        """All-or-nothing: if the roidb changed size since the snapshot the
        whole restore is skipped (restored indices would be wrong; a partial
        restore of just the RNG stream would leave a trajectory reproducible
        from neither the snapshot nor the fresh seed)."""
        if not self.cursor.matches(sd["cursor"]):
            print(f"resume: draw state is for a {len(sd['cursor']['perm'])}-"
                  f"entry roidb but this one has {self.cursor.n}; "
                  "starting from a fresh shuffle")
            return
        self.rng.set_state(sd["rng"])
        self.cursor.load_state_dict(sd["cursor"])

    def close(self):
        """Release the slot pool (slots > 1 leaks worker threads
        otherwise; Prefetcher.close cascades here)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None


class RoIDataLayerJoint:
    """Joint loader: IMS_PER_BATCH supervised + WS_IMS_PER_BATCH weak images
    per step, two independent shuffled cursors (layer_bus_joint.py:29-91).

    ``slots`` > 1 draws that many joint minibatches per ``forward()`` and
    stacks them contiguously along axis 0:

        [slot0: n_s supervised, n_ws weak | slot1: n_s, n_ws | ...]

    which is exactly the global-batch layout ``parallel.engine`` shards over
    the mesh data axis."""

    def __init__(self, roidb_s, roidb_ws, net_name: str, cfg: Config,
                 canvas_hw, is_training: bool = True,
                 rng: np.random.RandomState = None, slots: int = 1,
                 device_prep: bool = False):
        self.roidb_s = roidb_s
        self.roidb_ws = roidb_ws
        self.net_name = net_name
        self.cfg = cfg
        self.canvas_hw = canvas_hw
        self.rng = rng or np.random.RandomState(cfg.RNG_SEED)
        self.is_training = is_training
        self.slots = slots
        self.raw_hw = (_raw_canvas(roidb_s, roidb_ws) if device_prep
                       else None)
        self.cursor_s = _Cursor(len(roidb_s), is_training, self.rng)
        self.cursor_ws = _Cursor(len(roidb_ws), is_training, self.rng)
        self._pool = _slot_pool(slots)

    def _forward_one(self):
        ids = self.cursor_s.next(self.cfg.TRAIN.IMS_PER_BATCH)
        idw = self.cursor_ws.next(self.cfg.TRAIN.WS_IMS_PER_BATCH)
        return get_minibatch_joint([self.roidb_s[i] for i in ids],
                                   [self.roidb_ws[i] for i in idw],
                                   self.net_name, self.cfg, self.canvas_hw,
                                   self.rng, is_training=self.is_training,
                                   raw_hw=self.raw_hw)

    def forward(self):
        if self.slots == 1:
            return self._forward_one()
        # serial draws, parallel assembly — see RoIDataLayer.forward
        jobs = []
        for _ in range(self.slots):
            ids = self.cursor_s.next(self.cfg.TRAIN.IMS_PER_BATCH)
            idw = self.cursor_ws.next(self.cfg.TRAIN.WS_IMS_PER_BATCH)
            jobs.append(([self.roidb_s[i] for i in ids],
                         [self.roidb_ws[i] for i in idw],
                         np.random.RandomState(self.rng.randint(2 ** 31))))
        blobs = list(self._pool.map(
            lambda j: get_minibatch_joint(
                j[0], j[1], self.net_name, self.cfg, self.canvas_hw, j[2],
                is_training=self.is_training, raw_hw=self.raw_hw), jobs))
        return _concat_slots(blobs)

    def state_dict(self) -> dict:
        """See RoIDataLayer.state_dict (here: one RNG, two cursors)."""
        return {"rng": self.rng.get_state(),
                "cursor_s": self.cursor_s.state_dict(),
                "cursor_ws": self.cursor_ws.state_dict()}

    def load_state_dict(self, sd: dict) -> None:
        """All-or-nothing across BOTH cursors — see RoIDataLayer."""
        if not (self.cursor_s.matches(sd["cursor_s"])
                and self.cursor_ws.matches(sd["cursor_ws"])):
            print("resume: draw state is for differently-sized roidbs "
                  f"(saved {len(sd['cursor_s']['perm'])}s/"
                  f"{len(sd['cursor_ws']['perm'])}ws, have {self.cursor_s.n}s/"
                  f"{self.cursor_ws.n}ws); starting from a fresh shuffle")
            return
        self.rng.set_state(sd["rng"])
        self.cursor_s.load_state_dict(sd["cursor_s"])
        self.cursor_ws.load_state_dict(sd["cursor_ws"])

    def close(self):
        """Release the slot pool (see RoIDataLayer.close)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None


class Prefetcher:
    """Bounded-queue background prefetch around any layer with .forward().

    A worker-thread exception is captured and re-raised from the consumer's
    next ``forward()`` call instead of hanging it forever.

    The worker pairs every produced batch with the layer's post-draw
    ``state_dict()`` (when the layer has one), and ``state_dict()`` here
    returns the state paired with the last CONSUMED batch — not the layer's
    live state, which runs up to ``depth`` batches ahead.  Snapshotting
    through the Prefetcher therefore records a draw position synchronous
    with consumption, so an exact-trajectory resume re-draws precisely the
    batches the interrupted run never consumed.  Load state into the
    wrapped layer BEFORE constructing the Prefetcher (the worker starts
    drawing immediately)."""

    def __init__(self, layer, depth: int = 2):
        self.layer = layer
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._error = None
        self._get_state = getattr(layer, "state_dict", lambda: None)
        self._consumed_state = self._get_state()
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                blobs = self.layer.forward()
                state = self._get_state()
            except BaseException as e:  # noqa: BLE001 — relayed to consumer
                self._error = e
                self._stop.set()
                return
            while not self._stop.is_set():
                try:
                    self.q.put((blobs, state), timeout=0.5)
                    break
                except queue.Full:
                    continue

    def forward(self):
        while True:
            if self._error is not None:
                raise RuntimeError("prefetch worker failed") from self._error
            try:
                blobs, state = self.q.get(timeout=0.5)
                self._consumed_state = state
                return blobs
            except queue.Empty:
                if self._stop.is_set():  # closed with no pending error
                    raise RuntimeError("prefetcher is closed") from None
                continue

    def state_dict(self):
        return self._consumed_state

    def close(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        # cascade: release the wrapped layer's slot pool (if any)
        close = getattr(self.layer, "close", None)
        if close is not None:
            close()


def get_data_layer(roidbs, net_name, cfg, canvas_hw, is_training,
                   is_ws=False, is_joint=False, rng=None, slots=1,
                   device_prep=False):
    """Data-layer factory (reference ``get_data_layer``,
    train_bus.py:1037-1053): joint -> RoIDataLayerJoint over (roidb_s,
    roidb_ws); otherwise a single RoIDataLayer.  ``slots`` > 1 assembles
    per-mesh-slot global batches (see the layer docstrings);
    ``device_prep`` stages raw uint8 blobs finished on device
    (ops/device_prep.py)."""
    if is_joint:
        return RoIDataLayerJoint(roidbs[0], roidbs[1], net_name, cfg,
                                 canvas_hw, is_training=is_training, rng=rng,
                                 slots=slots, device_prep=device_prep)
    return RoIDataLayer(roidbs, net_name, cfg, canvas_hw,
                        is_training=is_training, is_ws=is_ws, rng=rng,
                        slots=slots, device_prep=device_prep)


def prefetch_iter(gen, depth: int = 2):
    """Run a generator on a background thread with a bounded queue —
    overlaps host-side work (file IO, decode, resize) with whatever the
    consumer does between ``next()`` calls (e.g. a device step).

    Worker exceptions re-raise at the consumer.  Abandoning the iterator
    early (consumer raises / breaks) stops the worker promptly: puts are
    timeout-bounded against a stop event that the generator's close hook
    sets, so no thread or buffer outlives the consumer loop."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()
    err = []

    def worker():
        try:
            for item in gen:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — relayed to consumer
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.5)
                    break
                except queue.Full:
                    continue

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise RuntimeError(
                        "prefetch_iter worker failed") from err[0]
                return
            yield item
    finally:
        # consumer finished or abandoned the loop: unblock the worker and
        # drop any buffered items
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
