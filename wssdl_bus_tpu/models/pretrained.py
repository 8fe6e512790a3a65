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


def _normalize_scope(scope: str) -> str:
    if scope.endswith("/3x3"):  # reference 'rpn_conv/3x3'
        scope = scope[:-len("/3x3")]
    return scope


def load_pretrained_npy(path: str, variables: dict, backbone: str,
                        verbose: bool = False) -> dict:
    """Return a copy of ``variables`` with matching pretrained weights
    assigned (scope-by-scope, ignore-missing semantics)."""
    data = np.load(path, allow_pickle=True, encoding="latin1")
    if hasattr(data, "item"):
        data = data.item()
    assert isinstance(data, dict), f"unexpected npy payload in {path}"

    variables = copy.deepcopy(jax_to_numpy(variables))
    flat = _flatten(variables)
    # (collection, semantic scope, leaf) -> [full paths]
    index = {}
    for p in flat:
        coll = "batch_stats" if "batch_stats" in p else "params"
        index.setdefault((coll, _semantic(p), p[-1]), []).append(p)

    n_loaded = 0
    for scope, vars_dict in data.items():
        scope_n = _normalize_scope(str(scope))
        for var_name, value in dict(vars_dict).items():
            value = np.asarray(value)
            coll, leaf = _VAR_MAP.get(var_name, ("params", var_name))
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
            if tuple(np.shape(old)) != tuple(value.shape):
                if verbose:
                    print(f"  skip {scope}/{var_name}: shape {value.shape} "
                          f"!= {np.shape(old)}")
                continue
            node = variables
            for seg in p[:-1]:
                node = node[seg]
            node[p[-1]] = value.astype(np.float32)
            n_loaded += 1
    if verbose:
        print(f"loaded {n_loaded} pretrained arrays from {path}")
    return variables


def jax_to_numpy(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)
