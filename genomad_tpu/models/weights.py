"""Weight persistence for the IGLOO classifier.

Three sources, in order of preference (genomad_tpu.paths.GenomadData):
  1. ``nn_classifier.npz``  — our native flat-key format (fast, canonical).
  2. ``nn_classifier.h5``   — the reference's Keras checkpoint
     (genomad/modules/nn_classification.py:309-310 loads it with
     ``model.load_weights``); converted on first use.
  3. deterministic synthetic weights — tests/benchmarks only.

The Keras -> pytree mapping is shape- and name-driven rather than a fixed
path list so it tolerates the layer-name suffixes Keras generates
("conv1d", "conv1d_1", ...).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from genomad_tpu import utils
from genomad_tpu.models import igloo

# Flat npz key -> (pytree path)
_FLAT_KEYS = [
    "conv1/kernel", "conv1/bias",
    "igloo1/patches", "igloo1/w_mult", "igloo1/w_summer", "igloo1/w_bias", "igloo1/w_qk", "igloo1/w_v",
    "conv2/kernel", "conv2/bias",
    "conv3/kernel", "conv3/bias",
    "igloo2/patches", "igloo2/w_mult", "igloo2/w_summer", "igloo2/w_bias", "igloo2/w_qk", "igloo2/w_v",
    "enc_dense/kernel", "enc_dense/bias",
    "enc_bn/gamma", "enc_bn/beta", "enc_bn/mean", "enc_bn/var",
    "head_dense/kernel", "head_dense/bias",
    "head_bn/gamma", "head_bn/beta", "head_bn/mean", "head_bn/var",
    "out_dense/kernel", "out_dense/bias",
]


def save_npz(params: igloo.Params, path: Path) -> None:
    flat = {}
    for key in _FLAT_KEYS:
        group, name = key.split("/")
        flat[key] = np.asarray(params[group][name])
    np.savez_compressed(path, **flat)


def load_npz(path: Path) -> igloo.Params:
    params: igloo.Params = {}
    with np.load(path) as npz:
        for key in _FLAT_KEYS:
            group, name = key.split("/")
            params.setdefault(group, {})[name] = npz[key]
    _validate(params)
    return params


def _validate(params: igloo.Params) -> None:
    expect = {
        "conv1/kernel": (igloo.CONV_KERNEL, igloo.VOCAB, igloo.CHANNELS),
        "conv2/kernel": (igloo.CONV_KERNEL, igloo.CHANNELS, igloo.CHANNELS),
        "conv3/kernel": (igloo.CONV_KERNEL, igloo.CHANNELS, igloo.CHANNELS),
        "igloo1/w_qk": (igloo.N_PATCHES, igloo.POOLED_LEN),
        "igloo2/w_qk": (igloo.N_PATCHES, igloo.POOLED_LEN),
        "enc_dense/kernel": (2 * igloo.CHANNELS, igloo.ENC_DIM),
        "head_dense/kernel": (igloo.ENC_DIM, igloo.ENC_DIM),
        "out_dense/kernel": (igloo.ENC_DIM, igloo.N_CLASSES),
    }
    for key, shape in expect.items():
        group, name = key.split("/")
        got = tuple(params[group][name].shape)
        if got != shape:
            raise ValueError(f"weight {key} has shape {got}, expected {shape}")


# ---------------------------------------------------------------------------
# Keras HDF5 conversion
# ---------------------------------------------------------------------------


def _walk_h5(group, prefix=""):
    import h5py

    for key, item in group.items():
        path = f"{prefix}/{key}"
        if isinstance(item, h5py.Dataset):
            yield path, np.asarray(item)
        else:
            yield from _walk_h5(item, path)


def load_keras_h5(path: Path) -> igloo.Params:
    """Convert the reference Keras checkpoint into our parameter pytree.

    Assignment strategy: collect every dataset, then route by
    (name keyword, shape); within a category, datasets are taken in
    natural path order (Keras suffixes _1, _2 encode creation order, which
    matches the graph order conv1 < conv2 < conv3 and igloo A < igloo B).
    """
    import h5py

    with h5py.File(path, "r") as f:
        datasets = dict(_walk_h5(f))

    def take_ordered(pred):
        return [datasets[k] for k in utils.natsort([p for p in datasets if pred(p, datasets[p])])]

    C, V, K = igloo.CHANNELS, igloo.VOCAB, igloo.CONV_KERNEL

    conv_kernels = take_ordered(lambda p, a: "kernel" in p.lower() and a.ndim == 3 and a.shape[0] == K)
    conv1_kernel = next(a for a in conv_kernels if a.shape[1] == V)
    rest = [a for a in conv_kernels if a.shape[1] == C]
    if len(rest) != 2:
        raise ValueError(f"expected 2 conv kernels of shape ({K},{C},{C}), found {len(rest)}")
    conv2_kernel, conv3_kernel = rest

    conv_biases = take_ordered(lambda p, a: "bias" in p.lower() and a.ndim == 1 and a.shape == (C,) and "conv" in p.lower())
    if len(conv_biases) != 3:
        raise ValueError(f"expected 3 conv biases, found {len(conv_biases)}")

    def igloo_group(index):
        def nth(keyword, shape):
            matches = take_ordered(lambda p, a: keyword in p and tuple(a.shape) == shape)
            if len(matches) != 2:
                raise ValueError(f"expected 2 '{keyword}' tensors of shape {shape}, found {len(matches)}")
            return matches[index]

        return {
            "patches": nth("random_patches", (igloo.N_PATCHES, igloo.PATCH_SIZE, 1)).reshape(igloo.N_PATCHES, igloo.PATCH_SIZE).astype(np.int32),
            "w_mult": nth("w_mult", (1, igloo.N_PATCHES, igloo.PATCH_SIZE, C))[0],
            "w_summer": nth("w_summer", (1, igloo.PATCH_SIZE * C, 1))[0, :, 0],
            "w_bias": nth("w_bias", (1, igloo.N_PATCHES))[0],
            "w_qk": nth("w_qk", (igloo.N_PATCHES, igloo.POOLED_LEN)),
            "w_v": nth("w_v", (1, C, C))[0],
        }

    def dense(shape):
        kernels = take_ordered(lambda p, a: "kernel" in p.lower() and tuple(a.shape) == shape)
        if not kernels:
            raise ValueError(f"no dense kernel of shape {shape} found")
        return kernels[0]

    def dense_bias(dim, exclude_conv=True):
        biases = take_ordered(
            lambda p, a: "bias" in p.lower() and a.shape == (dim,) and (not exclude_conv or "conv" not in p.lower())
        )
        return biases

    def bn(index):
        def grab(keyword):
            matches = take_ordered(lambda p, a: keyword in p.lower() and a.shape == (igloo.ENC_DIM,))
            if len(matches) != 2:
                raise ValueError(f"expected 2 batchnorm '{keyword}' tensors, found {len(matches)}")
            return matches[index]

        return {"gamma": grab("gamma"), "beta": grab("beta"), "mean": grab("moving_mean"), "var": grab("moving_variance")}

    enc_biases = dense_bias(igloo.ENC_DIM)
    # Two Dense(512) layers exist (encoder head + classifier head); the
    # batchnorm beta tensors also have shape (512,) but contain "beta" in
    # the name, which "bias" filtering already excludes.
    if len(enc_biases) != 2:
        raise ValueError(f"expected 2 dense biases of dim {igloo.ENC_DIM}, found {len(enc_biases)}")

    params = {
        "conv1": {"kernel": conv1_kernel, "bias": conv_biases[0]},
        "igloo1": igloo_group(0),
        "conv2": {"kernel": conv2_kernel, "bias": conv_biases[1]},
        "conv3": {"kernel": conv3_kernel, "bias": conv_biases[2]},
        "igloo2": igloo_group(1),
        "enc_dense": {"kernel": dense((2 * igloo.CHANNELS, igloo.ENC_DIM)), "bias": enc_biases[0]},
        "enc_bn": bn(0),
        "head_dense": {"kernel": dense((igloo.ENC_DIM, igloo.ENC_DIM)), "bias": enc_biases[1]},
        "head_bn": bn(1),
        "out_dense": {"kernel": dense((igloo.ENC_DIM, igloo.N_CLASSES)), "bias": dense_bias(igloo.N_CLASSES)[0]},
    }
    _validate(params)
    return params


def load_params(console=None) -> igloo.Params:
    """Load the classifier weights from the best available source."""
    from genomad_tpu.paths import GenomadData

    if GenomadData.nn_params_file.exists():
        return load_npz(GenomadData.nn_params_file)
    if GenomadData.nn_model_file.exists():
        params = load_keras_h5(GenomadData.nn_model_file)
        try:
            save_npz(params, GenomadData.nn_params_file)
        except OSError:  # pragma: no cover - read-only installs
            pass
        return params
    if console is not None:
        console.warning(
            "Trained NN weights not found (nn_classifier.npz / nn_classifier.h5). "
            "Falling back to deterministic synthetic weights — scores will NOT "
            "be meaningful. Install the model weights into genomad_tpu/data/."
        )
    return igloo.init_params(seed=0)
