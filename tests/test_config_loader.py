"""Config layering (YAML + KEY VALUE overrides, strict merge) and data-layer
cursor semantics (epoch shuffling, joint dual cursors)."""

import numpy as np
import pytest

from wssdl_bus_tpu.config import Config
from wssdl_bus_tpu.data.loader import _Cursor


def test_config_overrides_and_types():
    cfg = Config().with_overrides([
        "TRAIN.LEARNING_RATE", "0.001",
        "TRAIN.SCALES", "(300, 500)",
        "TEST.NMS", "0.5",
        "TRAIN.USE_FLIPPED", "False",
    ])
    assert cfg.TRAIN.LEARNING_RATE == 0.001
    assert cfg.TRAIN.SCALES == (300, 500)
    assert cfg.TEST.NMS == 0.5
    assert cfg.TRAIN.USE_FLIPPED is False
    # originals untouched (immutability)
    assert Config().TRAIN.LEARNING_RATE == 0.0005
    with pytest.raises(KeyError):
        Config().with_overrides(["TRAIN.NOPE", "1"])
    with pytest.raises(TypeError):
        Config().with_overrides(["TRAIN.IMS_PER_BATCH", "'one'"])
    with pytest.raises(ValueError):
        Config().with_overrides(["TRAIN.IMS_PER_BATCH"])


def test_config_yaml_roundtrip(tmp_path):
    p = tmp_path / "o.yml"
    p.write_text("TRAIN:\n  SNAPSHOT_ITERS: 77\nTEST:\n  NMS: 0.45\n")
    cfg = Config.from_yaml(str(p))
    assert cfg.TRAIN.SNAPSHOT_ITERS == 77
    assert cfg.TEST.NMS == 0.45
    assert cfg.TRAIN.DISPLAY == 10  # untouched default


def test_cursor_epoch_semantics():
    rng = np.random.RandomState(0)
    cur = _Cursor(5, shuffle=True, rng=rng)
    seen = []
    for _ in range(2):  # one epoch of batch-2 (last batch triggers reshuffle)
        seen.extend(cur.next(2).tolist())
    # indices come from the permutation without repetition within the epoch
    assert len(set(seen)) == len(seen)
    # unshuffled test-mode cursor iterates in order
    cur2 = _Cursor(4, shuffle=False, rng=rng)
    assert cur2.next(2).tolist() == [0, 1]
    assert cur2.next(2).tolist() == [2, 3]
    assert cur2.next(2).tolist() == [0, 1]  # wraps to a fresh epoch


def test_augment_vgg_vs_resnet_scaling(rng):
    from wssdl_bus_tpu.config import Config
    from wssdl_bus_tpu.data.augment import prep_image

    im = (rng.rand(300, 400) * 255).astype(np.uint8)
    cfg = Config()
    v, sv = prep_image(im, "VGGnet_test", cfg, False, False, rng)
    r, sr = prep_image(im, "Resnet_test", cfg, False, False, rng)
    assert sv == sr
    # VGG output = x*255, ResNet = x/(std/255) = x*255/std for the same
    # mean-subtracted x, so VGG/ResNet == std everywhere (blob.py:74-77)
    mask = np.abs(r) > 1e-3
    np.testing.assert_allclose((v / r)[mask], cfg.PIXEL_STD, rtol=1e-3)


def test_multiscale_test_config_fails_loudly(rng):
    """Multi-scale TEST.SCALES must hard-fail at inference, never silently
    sample one scale: the reference's live RPN path asserts single-scale
    (test_bus.py:209) and its image pyramid feeds only the dead
    HAS_RPN=False path (test_bus.py:48-104).  Training keeps the
    reference's random per-image scale draw (minibatch_bus.py:24-25)."""
    from wssdl_bus_tpu.data.augment import prep_image

    im = (rng.rand(300, 400) * 255).astype(np.uint8)
    cfg = Config().with_overrides(["TEST.SCALES", "(400, 600)",
                                   "TRAIN.SCALES", "(400, 600)"])
    with pytest.raises(NotImplementedError, match="multi-scale"):
        prep_image(im, "VGGnet_test", cfg, is_training=False, is_ws=False,
                   rng=rng)
    # training multi-scale stays supported (random draw per image)
    out, _ = prep_image(im, "VGGnet_train", cfg, is_training=True,
                        is_ws=False, rng=rng)
    assert min(out.shape) in (400, 600)


def test_loader_slots_layout(monkeypatch):
    """slots>1 stacks per-slot minibatches contiguously along axis 0 —
    the global-batch layout parallel.engine shards over the data axis —
    with the assembly fanned out to a worker pool (order preserved)."""
    from wssdl_bus_tpu.config import Config
    from wssdl_bus_tpu.data import loader as ld

    def fake_minibatch(batch, net_name, cfg, canvas_hw, is_training, is_ws,
                       rng, raw_hw=None):
        assert rng is not None  # each slot gets a private RandomState
        return {"data": np.full((len(batch), 4), batch[0]["id"], np.float32)}

    monkeypatch.setattr(ld, "get_minibatch", fake_minibatch)
    cfg = Config()
    roidb = [{"id": i} for i in range(6)]
    # unshuffled test-mode cursor (1 image/slot) -> slot s draws entry s
    layer = ld.RoIDataLayer(roidb, "VGGnet_train", cfg, (64, 64),
                            is_training=False, slots=3)
    out = layer.forward()
    assert out["data"].shape == (3, 4)
    for s in range(3):  # slot s occupies row s, in cursor-draw order
        assert (out["data"][s] == s).all()
    # slots=1 fast path: single serial minibatch, dict passed through
    layer1 = ld.RoIDataLayer(roidb, "VGGnet_train", cfg, (64, 64),
                             is_training=False, slots=1)
    assert (layer1.forward()["data"] == 0).all()


def test_prefetcher_order_and_error_propagation():
    from wssdl_bus_tpu.data.loader import Prefetcher

    class Fake:
        def __init__(self):
            self.i = 0

        def forward(self):
            self.i += 1
            if self.i > 5:
                raise ValueError("boom")
            return {"step": self.i}

    pf = Prefetcher(Fake(), depth=2)
    got = [pf.forward()["step"] for _ in range(5)]
    assert got == [1, 2, 3, 4, 5]
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="prefetch worker failed"):
        pf.forward()
    pf.close()

    class Slow:
        def forward(self):
            return {"x": 0}

    pf2 = Prefetcher(Slow())
    assert pf2.forward() == {"x": 0}
    pf2.close()  # close drains and stops cleanly


def test_latest_checkpoint_skips_incomplete(tmp_path):
    """A crash mid-write (overlapped or sync) leaves orbax staging dirs
    and/or no variables dir; --resume must fall back to the newest
    COMPLETE snapshot instead of failing on the half-written one."""
    from wssdl_bus_tpu.train.checkpoint import latest_checkpoint

    (tmp_path / "net_iter_2" / "variables").mkdir(parents=True)
    half = tmp_path / "net_iter_5"
    (half / "variables.orbax-checkpoint-tmp-123").mkdir(parents=True)
    got = latest_checkpoint(str(tmp_path))
    assert got is not None and got.endswith("net_iter_2")

    (tmp_path / "net_iter_7" / "variables").mkdir(parents=True)
    assert latest_checkpoint(str(tmp_path)).endswith("net_iter_7")

    # the host pickle (written FIRST, atomically) records which tensor
    # components the snapshot carries; any missing one means a crash in
    # the inter-save window and the snapshot must be skipped
    import pickle

    nine = tmp_path / "net_iter_9"
    (nine / "variables").mkdir(parents=True)
    with open(nine / "host_state.pkl", "wb") as f:
        pickle.dump({"components": ["variables", "opt_state"]}, f)
    assert latest_checkpoint(str(tmp_path)).endswith("net_iter_7")
    (nine / "opt_state").mkdir()
    assert latest_checkpoint(str(tmp_path)).endswith("net_iter_9")

    # a truncated host pickle is a mid-write crash, not a usable snapshot
    eleven = tmp_path / "net_iter_11"
    (eleven / "variables").mkdir(parents=True)
    (eleven / "host_state.pkl").write_bytes(b"\x80\x05\x95")
    assert latest_checkpoint(str(tmp_path)).endswith("net_iter_9")


def test_prefetcher_state_pairs_with_consumption():
    """Prefetcher.state_dict() must return the draw state paired with the
    last CONSUMED batch, not the worker's read-ahead position — restoring
    it into a fresh layer re-draws exactly the unconsumed batches."""
    import time

    from wssdl_bus_tpu.data.loader import Prefetcher

    class Fake:
        """Deterministic layer whose state is 'how many draws happened'."""

        def __init__(self, start=0):
            self.i = start

        def forward(self):
            self.i += 1
            return {"step": self.i}

        def state_dict(self):
            return {"i": self.i}

        def load_state_dict(self, sd):
            self.i = int(sd["i"])

    layer = Fake()
    pf = Prefetcher(layer, depth=3)
    assert pf.state_dict() == {"i": 0}  # nothing consumed yet
    assert pf.forward()["step"] == 1
    assert pf.forward()["step"] == 2
    # give the worker time to run ahead (depth 3 + one in flight)
    deadline = time.time() + 2.0
    while layer.i < 5 and time.time() < deadline:
        time.sleep(0.01)
    assert layer.i > 2  # the live layer IS ahead of consumption...
    state = pf.state_dict()
    assert state == {"i": 2}  # ...but the snapshot is not
    pf.close()

    resumed = Fake()
    resumed.load_state_dict(state)
    pf2 = Prefetcher(resumed, depth=3)
    assert pf2.forward()["step"] == 3  # continues where consumption stopped
    pf2.close()
