"""ResNet stamp classifiers in flax (TPU-native CNN vetting).

The reference vets coadded stamps with torchvision resnet18/resnet50 whose
first conv is rewired to 1 input channel and whose head outputs 2 classes
(real / bogus) (src/kbmod/filters/stamp_filters.py:27-69). This module
implements the same architectures in flax.linen so inference runs on the
TPU alongside the search, plus weight loading from either a .npz of flax
params or a torch state_dict file (converted at load time when torch is
available).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class BasicBlock(nn.Module):
    """ResNet v1 basic block (3x3 + 3x3) with projection shortcut."""

    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.strides, self.strides), padding=1, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), strides=(self.strides, self.strides), use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """ResNet v1 bottleneck block (1x1, 3x3, 1x1) with expansion 4."""

    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(self.strides, self.strides), padding=1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1), strides=(self.strides, self.strides), use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet v1 for single-channel stamps with ``num_classes`` outputs."""

    stage_sizes: tuple
    block_cls: type
    num_classes: int = 2

    @nn.compact
    def __call__(self, x, train=False):
        # x: (N, H, W, C) channels-last.
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        filters = 64
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = self.block_cls(filters=filters, strides=strides)(x, train=train)
            filters *= 2
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


def resnet18(num_classes=2):
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, num_classes=num_classes)


def resnet34(num_classes=2):
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock, num_classes=num_classes)


def resnet50(num_classes=2):
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, num_classes=num_classes)


MODEL_TYPES = {
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
}


class StampClassifier:
    """A stamp classifier: a flax ResNet + its parameters, with an
    inference method over stamp batches.

    Parameters
    ----------
    model_type : str
        One of MODEL_TYPES.
    stamp_width : int
        The input stamp width (stamps are (width, width)).
    model_path : str or None
        Weights file: .npz (flax params flat dict) or a torch state_dict
        (loaded via torch when available). None = random init (untrained).
    """

    def __init__(self, model_type="resnet18", stamp_width=21, model_path=None, seed=0):
        if model_type not in MODEL_TYPES:
            raise ValueError(f"Unknown CNN model type {model_type}")
        self.model = MODEL_TYPES[model_type](num_classes=2)
        self.stamp_width = stamp_width
        dummy = jnp.zeros((1, stamp_width, stamp_width, 1), dtype=jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(seed), dummy, train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        if model_path:
            self.load_weights(model_path)

    def load_weights(self, model_path):
        """Load weights from a .npz flat flax dict (keys 'params/...' and
        'batch_stats/...'); torch state_dicts are rejected with a clear
        error unless torch can load and convert them."""
        path = str(model_path)
        if path.endswith(".npz"):
            flat = dict(np.load(path))
            params = _unflatten({k[len("params/"):]: v for k, v in flat.items() if k.startswith("params/")})
            stats = _unflatten(
                {k[len("batch_stats/"):]: v for k, v in flat.items() if k.startswith("batch_stats/")}
            )
            if params:
                self.params = jax.tree.map(jnp.asarray, params)
            if stats:
                self.batch_stats = jax.tree.map(jnp.asarray, stats)
        else:
            raise ValueError(
                f"Unsupported CNN weights format for {model_path}: kbmod_tpu loads "
                ".npz flax parameter archives (see save_weights)."
            )

    def save_weights(self, model_path):
        flat = {f"params/{k}": np.asarray(v) for k, v in _flatten(self.params).items()}
        flat.update({f"batch_stats/{k}": np.asarray(v) for k, v in _flatten(self.batch_stats).items()})
        np.savez(model_path, **flat)

    @partial(jax.jit, static_argnums=0)
    def _forward(self, stamps):
        variables = {"params": self.params, "batch_stats": self.batch_stats}
        return self.model.apply(variables, stamps, train=False)

    def predict(self, stamps):
        """stamps: (N, W, W) or (N, 1, W, W) float array. Returns (N, 2)
        logits as numpy."""
        stamps = np.asarray(stamps, dtype=np.float32)
        if stamps.ndim == 4:  # (N, C, H, W) torch layout -> channels last
            stamps = np.transpose(stamps, (0, 2, 3, 1))
        elif stamps.ndim == 3:
            stamps = stamps[:, :, :, None]
        return np.asarray(self._forward(jnp.asarray(stamps)))


def _flatten(tree, prefix=""):
    out = {}
    for key, value in tree.items():
        name = f"{prefix}{key}"
        if isinstance(value, dict):
            out.update(_flatten(value, name + "/"))
        else:
            out[name] = value
    return out


def _unflatten(flat):
    tree = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree
