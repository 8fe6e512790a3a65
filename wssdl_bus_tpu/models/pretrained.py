"""ImageNet ``.npy`` pretrained-weight import.

The reference loads a numpy dict-of-dicts ``{scope: {var_name: value}}`` and
assigns per-variable, silently skipping anything that does not exist or fit
(``network.py:52-66`` with ignore_missing=True — notably the BUS VGG head is
512-wide while the ImageNet fc6/fc7 are 4096-wide, so those are skipped and
trained from scratch, as in the reference).

Naming: our flax modules reuse the reference scope names (conv1_1 … conv5_3,
fc6, fc7, rpn_conv, cls_score, bbox_pred — see models/vgg.py, models/resnet.py)
so the mapping is scope -> the flax subtree of the same name; 'weights' maps
to the conv/dense kernel and 'biases' to its bias.  TF conv kernels are
[kh, kw, cin, cout] — identical to flax's layout, no transpose needed; dense
kernels are [cin, cout] in both.

Note: a dense kernel whose input comes from flattened conv features would
need its rows permuted from the reference's (C, H, W) flatten order to our
NHWC order (models/layers.py Fc docstring).  No such kernel is loadable in
practice (the BUS heads are 512-wide vs ImageNet's 4096), so shape-mismatch
skipping covers it; if a matching checkpoint ever appears, permute rows with
``np.transpose(w.reshape(C, H, W, out), (1, 2, 0, 3)).reshape(-1, out)``.
"""

from __future__ import annotations

import copy
import numpy as np

_VAR_MAP = {"weights": "kernel", "biases": "bias",
            "gamma": "scale", "beta": "bias",
            "moving_mean": "mean", "moving_variance": "var"}


def _find_scope(tree: dict, scope: str, path=()):
    """Depth-first search for a subtree keyed by ``scope``."""
    for k, v in tree.items():
        if k == scope and isinstance(v, dict):
            return path + (k,), v
        if isinstance(v, dict):
            hit = _find_scope(v, scope, path + (k,))
            if hit is not None:
                return hit
    return None


def _assign(subtree: dict, var_name: str, value: np.ndarray, label: str,
            verbose: bool):
    """Assign into the conv/dense/bn child holding this variable."""
    target_name = _VAR_MAP.get(var_name, var_name)
    for child_key in ("conv", "dense", "bn", "gn"):
        child = subtree.get(child_key)
        if isinstance(child, dict) and target_name in child:
            old = child[target_name]
            if tuple(np.shape(old)) != tuple(value.shape):
                if verbose:
                    print(f"  skip {label}/{var_name}: shape "
                          f"{value.shape} != {np.shape(old)}")
                return False
            child[target_name] = np.asarray(value, dtype=np.float32)
            return True
    if target_name in subtree:  # flat variables (e.g. bare bn stats)
        if tuple(np.shape(subtree[target_name])) == tuple(value.shape):
            subtree[target_name] = np.asarray(value, dtype=np.float32)
            return True
    if verbose:
        print(f"  skip {label}/{var_name}: no matching variable")
    return False


def load_pretrained_npy(path: str, variables: dict, backbone: str,
                        verbose: bool = False) -> dict:
    """Return a copy of ``variables`` with matching pretrained weights
    assigned (scope-by-scope, ignore-missing semantics)."""
    data = np.load(path, allow_pickle=True, encoding="latin1")
    if hasattr(data, "item"):
        data = data.item()
    assert isinstance(data, dict), f"unexpected npy payload in {path}"

    variables = copy.deepcopy(jax_to_numpy(variables))
    n_loaded = 0
    for scope, vars_dict in data.items():
        hit = _find_scope(variables, scope.split("/")[-1])
        if hit is None:
            if verbose:
                print(f"  skip scope {scope}: not in model")
            continue
        _, subtree = hit
        for var_name, value in dict(vars_dict).items():
            if _assign(subtree, var_name, np.asarray(value), scope, verbose):
                n_loaded += 1
    if verbose:
        print(f"loaded {n_loaded} pretrained arrays from {path}")
    return variables


def jax_to_numpy(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)
