"""ImageNet ``.npy`` pretrained-weight import.

The reference loads a numpy dict-of-dicts ``{scope: {var_name: value}}`` and
assigns per-variable, silently skipping anything that does not exist or fit
(``network.py:52-66`` with ignore_missing=True — notably the BUS VGG head is
512-wide while the ImageNet fc6/fc7 are 4096-wide, so those are skipped and
trained from scratch, as in the reference).

Scope resolution: checkpoint keys are TF variable-scope paths — flat for VGG
(``conv1_1`` … ``fc7``) and slash-nested for ResNet
(``group0/block0/conv1``, ``group2/norm`` — Resnet_train_bus.py:55-101).
Each scope is matched against the flax variable tree by SUFFIX of the
"semantic path": the module path with flax container modules (``conv`` /
``dense`` / ``bn`` / ``gn``) and collection roots stripped, plus the alias
``<name>_norm`` == ``<name>/norm`` (our flax names cannot contain slashes)
and ``rpn_conv/3x3`` == ``rpn_conv``.  Ambiguous or missing scopes are
skipped (ignore-missing), never guessed.

Variable routing: ``weights``/``biases``/``gamma``/``beta`` land in the
``params`` collection (flax names kernel/bias/gamma/beta — our BatchRenorm
and GroupNormRef deliberately keep the TF affine names); ``moving_mean`` /
``moving_variance`` (and ``mean``/``variance``) land in ``batch_stats`` as
``mean``/``var`` so pretrained running statistics drive eval-mode BN.

Checkpoint keys may split the full TF variable path arbitrarily between the
scope and the var name (the reference's loader resolves
``tf.get_variable(subkey)`` under ``variable_scope(key)``, network.py:52-66,
so e.g. BN vars can arrive as scope ``group0/block0/conv1`` + subkey
``batch_normalization/gamma`` OR scope ``…/conv1/batch_normalization`` +
subkey ``gamma``): we re-join and re-split at the last ``/``, and drop the
``batch_normalization`` path segment that ``tf.layers.batch_normalization``
inserts (network.py:122-123).  The reference's hand-rolled group_norm stores
gamma/beta as ``[1,1,1,C]`` (network.py:540-541) where ours are ``[C]``;
values whose squeezed shape matches are reshaped on load.

TF conv kernels are [kh, kw, cin, cout] — identical to flax's layout, no
transpose needed; dense kernels are [cin, cout] in both.  A dense kernel fed
by flattened conv features would need its rows permuted from the reference's
(C, H, W) flatten order to our NHWC order (models/layers.py Fc docstring);
no such kernel is loadable in practice (the BUS heads are 512-wide vs
ImageNet's 4096), so shape-mismatch skipping covers it.
"""

from __future__ import annotations

import copy
import numpy as np

# checkpoint var name -> (collection, flax leaf name)
_VAR_MAP = {
    "weights": ("params", "kernel"),
    "biases": ("params", "bias"),
    "gamma": ("params", "gamma"),
    "beta": ("params", "beta"),
    "moving_mean": ("batch_stats", "mean"),
    "moving_variance": ("batch_stats", "var"),
    "mean": ("batch_stats", "mean"),
    "variance": ("batch_stats", "var"),
}

_CONTAINERS = {"conv", "dense", "bn", "gn"}
_COLLECTION_ROOTS = {"trunk", "head", "params", "batch_stats"}


def _flatten(tree, path=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, path + (k,)))
        else:
            out[path + (k,)] = v
    return out


def _semantic(path):
    """Module path with collection roots and flax containers stripped,
    '_norm' keys exposed as '/norm' segments, joined by '/'."""
    parts = []
    for seg in path[:-1]:  # last element is the leaf var name
        if seg in _COLLECTION_ROOTS or seg in _CONTAINERS \
                or seg == "backbone":
            continue
        if seg.endswith("_norm"):
            parts.extend([seg[:-len("_norm")], "norm"])
        else:
            parts.append(seg)
    return "/".join(parts)


def _split_entry(scope: str, var_name: str):
    """(scope, var) -> (normalized scope, collection, flax leaf).  Re-joins
    the full TF variable path and re-splits at the last '/' so any
    scope/subkey split the reference loader accepts resolves identically."""
    segs = (str(scope) + "/" + str(var_name)).split("/")
    coll, leaf = _VAR_MAP.get(segs[-1], ("params", segs[-1]))
    scope_segs = [s for s in segs[:-1]
                  if s not in ("batch_normalization", "3x3")]
    return "/".join(scope_segs), coll, leaf


def load_pretrained_npy(path: str, variables: dict, backbone: str,
                        verbose: bool = False, min_loaded: int = 0) -> dict:
    """Return a copy of ``variables`` with matching pretrained weights
    assigned (scope-by-scope, ignore-missing semantics).

    ``min_loaded``: raise if fewer than this many arrays matched — guards
    the CLI path against a checkpoint whose scope names silently match
    nothing (ignore-missing would otherwise "succeed" loading 0)."""
    data = np.load(path, allow_pickle=True, encoding="latin1")
    if hasattr(data, "item"):
        data = data.item()
    assert isinstance(data, dict), f"unexpected npy payload in {path}"
    return load_pretrained_dict(data, variables, backbone, verbose=verbose,
                                min_loaded=min_loaded, source=path)


def load_pretrained_dict(data: dict, variables: dict, backbone: str,
                         verbose: bool = False, min_loaded: int = 0,
                         source: str = "<dict>") -> dict:
    """Core of the importer: assign a ``{scope: {var_name: value}}`` dict
    into a copy of ``variables`` (see module docstring for the matching
    rules)."""
    variables = copy.deepcopy(jax_to_numpy(variables))
    flat = _flatten(variables)
    # (collection, semantic scope, leaf) -> [full paths]
    index = {}
    for p in flat:
        coll = "batch_stats" if "batch_stats" in p else "params"
        index.setdefault((coll, _semantic(p), p[-1]), []).append(p)

    n_loaded = 0
    for scope, vars_dict in data.items():
        for var_name, value in dict(vars_dict).items():
            value = np.asarray(value)
            scope_n, coll, leaf = _split_entry(scope, var_name)
            # exact semantic-suffix match: semantic path equals the scope or
            # ends with '/<scope>'
            cands = []
            for (c, sem, lf), paths in index.items():
                if c != coll or lf != leaf:
                    continue
                if sem == scope_n or sem.endswith("/" + scope_n):
                    cands.extend(paths)
            if not cands:
                if verbose:
                    print(f"  skip {scope}/{var_name}: no matching variable")
                continue
            if len(cands) > 1:
                if verbose:
                    print(f"  skip {scope}/{var_name}: ambiguous "
                          f"({len(cands)} matches)")
                continue
            p = cands[0]
            old = flat[p]
            want = tuple(np.shape(old))
            if want != tuple(value.shape):
                # reference group_norm affine is [1,1,1,C] vs our [C]
                # (network.py:540-541): accept squeeze-equivalent shapes
                if tuple(np.squeeze(value).shape) == want:
                    value = value.reshape(want)
                else:
                    if verbose:
                        print(f"  skip {scope}/{var_name}: shape "
                              f"{value.shape} != {want}")
                    continue
            node = variables
            for seg in p[:-1]:
                node = node[seg]
            node[p[-1]] = value.astype(np.float32)
            n_loaded += 1
    if verbose:
        print(f"loaded {n_loaded} pretrained arrays from {source}")
    if n_loaded < min_loaded:
        raise ValueError(
            f"pretrained import matched only {n_loaded} arrays from "
            f"{source} (expected >= {min_loaded}); checkpoint scope names "
            f"likely do not correspond to the {backbone} graph")
    return variables


# --------------------------------------------------------------------- #
# torchvision VGG16 import
# --------------------------------------------------------------------- #
# (flat reference scope, torchvision features index) for the 13 convs
_TV_VGG16_LAYERS = (
    ("conv1_1", 0), ("conv1_2", 2), ("conv2_1", 5), ("conv2_2", 7),
    ("conv3_1", 10), ("conv3_2", 12), ("conv3_3", 14),
    ("conv4_1", 17), ("conv4_2", 19), ("conv4_3", 21),
    ("conv5_1", 24), ("conv5_2", 26), ("conv5_3", 28),
)
# torchvision's ImageNet input normalization (vgg16 weight card)
_TV_MEAN = (0.485, 0.456, 0.406)
_TV_STD = (0.229, 0.224, 0.225)


def _resolve_pixel_mean(pixel_mean):
    if pixel_mean is None:
        from wssdl_bus_tpu.config import Config
        return Config().PIXEL_MEAN
    return pixel_mean


def torchvision_vgg16_to_reference(state_dict, pixel_mean: float = None,
                                   fold_normalization: bool = True) -> dict:
    """torchvision ``vgg16`` state_dict -> the reference's ``.npy`` layout
    ``{scope: {'weights': HWIO, 'biases': [C]}}``.

    The reference's published ``.npy`` weights are caffe-era (BGR, 0-255
    pixel scale); torchvision's are the obtainable modern alternative but
    expect ``(x - mean) / std`` on 0-1 RGB input, while this pipeline feeds
    VGG ``raw_gray - PIXEL_MEAN`` replicated across 3 channels
    (data/augment.py prep_image, blob.py:74-77 parity).  With
    ``fold_normalization`` the difference is folded into conv1_1 EXACTLY:

        z_c = (y/255 + m - mu_c) / sigma_c          (y = our input channel,
                                                     m = PIXEL_MEAN/255)
        => W'_c = W_c / (255 sigma_c)
           b'   = b + sum_c ((m - mu_c)/sigma_c) * sum_hw W_c

    so the converted trunk computes exactly what torchvision's does
    wherever a 3x3 window lies inside the image (oracle-tested against
    torch forward in tests/test_torchvision_import.py).  At zero-padded
    conv borders the conventions inherently differ — each pipeline pads
    with zeros in its OWN input space, and zero-in-pixel-space is not
    zero-in-normalized-space — by the folded shift times the out-of-image
    kernel taps; empirically this dilutes to ~1e-6 absolute by the final
    stride-16 features and is immaterial for a transfer-learning init.
    The 4096-wide classifier layers are NOT emitted — the BUS heads are
    512-wide and train from scratch, like the reference's ignore-missing
    skip (network.py:52-66).

    ResNet is deliberately unsupported: torchvision's resnets are post-
    activation, the reference's are tensorpack-style pre-activation
    (Resnet_train_bus.py:55-101) — the graphs do not correspond.
    """
    pixel_mean = _resolve_pixel_mean(pixel_mean)
    missing = [f"features.{i}.weight" for _, i in _TV_VGG16_LAYERS
               if f"features.{i}.weight" not in state_dict]
    if missing:
        raise ValueError(
            "state_dict does not match torchvision's plain vgg16 'features' "
            f"layout (missing {missing[:3]}{'...' if len(missing) > 3 else ''}); "
            "only torchvision.models.vgg16 (no _bn variant) is supported")
    out = {}
    for scope, idx in _TV_VGG16_LAYERS:
        w = np.asarray(state_dict[f"features.{idx}.weight"], np.float32)
        b = np.asarray(state_dict[f"features.{idx}.bias"], np.float32)
        w = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO (flax/TF layout)
        if scope == "conv1_1" and fold_normalization:
            m = pixel_mean / 255.0
            scale = np.asarray([1.0 / (255.0 * s) for s in _TV_STD],
                               np.float32)
            shift = np.asarray([(m - mu) / s
                                for mu, s in zip(_TV_MEAN, _TV_STD)],
                               np.float32)
            b = b + np.einsum("hwio,i->o", w, shift)
            w = w * scale[None, None, :, None]
        out[scope] = {"weights": w, "biases": b}
    return out


def load_pretrained_auto(path: str, variables: dict, backbone: str,
                         verbose: bool = False, min_loaded: int = 0,
                         pixel_mean: float = None) -> dict:
    """Dispatch on the checkpoint's extension: ``.pth``/``.pt`` loads a
    torchvision vgg16 state_dict, anything else the reference's ``.npy``
    dict.  The Solver's ``--pretrained_model`` path."""
    if path.endswith((".pth", ".pt")):
        return load_pretrained_torchvision(path, variables, backbone,
                                           verbose=verbose,
                                           min_loaded=min_loaded,
                                           pixel_mean=pixel_mean)
    return load_pretrained_npy(path, variables, backbone, verbose=verbose,
                               min_loaded=min_loaded)


def load_pretrained_torchvision(path_or_state_dict, variables: dict,
                                backbone: str, verbose: bool = False,
                                min_loaded: int = 0,
                                pixel_mean: float = None) -> dict:
    """Load torchvision ``vgg16`` weights (a ``.pth``/``.pt`` file or an
    in-memory state_dict) into the VGG trunk — see
    :func:`torchvision_vgg16_to_reference` for the normalization folding."""
    if backbone != "VGGnet":
        raise ValueError(
            "torchvision import supports VGG16 only: torchvision resnets "
            "are post-activation, the reference's are pre-activation "
            "(use a tensorpack-style .npy for ResNet)")
    sd = path_or_state_dict
    if isinstance(sd, str):
        import torch
        sd = torch.load(sd, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v) for k, v in dict(sd).items()
          if k.startswith("features.")}
    data = torchvision_vgg16_to_reference(sd, pixel_mean=pixel_mean)
    return load_pretrained_dict(data, variables, backbone, verbose=verbose,
                                min_loaded=min_loaded,
                                source="torchvision vgg16")


def jax_to_numpy(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)
