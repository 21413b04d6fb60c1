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
        'batch_stats/...') or a torch checkpoint (a torchvision-style
        resnet state_dict, converted at load time when torch is
        importable; reference stamp_filters.py:27-69 loads such files)."""
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
            try:
                import torch
            except ImportError as err:
                raise ValueError(
                    f"Unsupported CNN weights format for {model_path}: without torch, "
                    "kbmod_tpu loads .npz flax parameter archives (see save_weights)."
                ) from err
            state = torch.load(path, map_location="cpu", weights_only=False)
            if hasattr(state, "state_dict"):
                state = state.state_dict()
            state = {k: np.asarray(v) for k, v in state.items()}
            self.params, self.batch_stats = convert_torch_state_dict(
                state, self.model.stage_sizes, self.model.block_cls
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


def convert_torch_state_dict(state, stage_sizes, block_cls):
    """Convert a torchvision-style resnet ``state_dict`` (numpy arrays,
    OIHW convs) into this module's flax ``(params, batch_stats)`` trees.

    Key layout follows torchvision resnets (the reference's model source,
    stamp_filters.py:27-30): root ``conv1``/``bn1``/``fc``, stages
    ``layer{1..4}.{b}`` with ``conv1/bn1/conv2/bn2[/conv3/bn3]`` and an
    optional ``downsample.0``/``downsample.1`` projection. A leading
    ``model.`` prefix (the reference's ``_KBMLModel`` wrapper,
    stamp_filters.py:55-69) is stripped.
    """
    state = {
        (k[len("model."):] if k.startswith("model.") else k): np.asarray(v)
        for k, v in state.items()
    }

    def conv(key):
        # torch OIHW -> flax HWIO
        return {"kernel": np.transpose(state[key + ".weight"], (2, 3, 1, 0))}

    def bn(key):
        p = {"scale": state[key + ".weight"], "bias": state[key + ".bias"]}
        s = {"mean": state[key + ".running_mean"], "var": state[key + ".running_var"]}
        return p, s

    params, stats = {}, {}
    params["Conv_0"] = conv("conv1")
    params["BatchNorm_0"], stats["BatchNorm_0"] = bn("bn1")

    n_convs = 3 if block_cls is Bottleneck else 2
    block_name = "Bottleneck" if block_cls is Bottleneck else "BasicBlock"
    block_idx = 0
    for stage, num_blocks in enumerate(stage_sizes):
        for b in range(num_blocks):
            src = f"layer{stage + 1}.{b}"
            bp, bs = {}, {}
            for c in range(n_convs):
                bp[f"Conv_{c}"] = conv(f"{src}.conv{c + 1}")
                bp[f"BatchNorm_{c}"], bs[f"BatchNorm_{c}"] = bn(f"{src}.bn{c + 1}")
            if f"{src}.downsample.0.weight" in state:
                bp[f"Conv_{n_convs}"] = conv(f"{src}.downsample.0")
                bp[f"BatchNorm_{n_convs}"], bs[f"BatchNorm_{n_convs}"] = bn(f"{src}.downsample.1")
            name = f"{block_name}_{block_idx}"
            params[name], stats[name] = bp, bs
            block_idx += 1

    params["Dense_0"] = {"kernel": state["fc.weight"].T, "bias": state["fc.bias"]}
    as_jnp = lambda tree: jax.tree.map(jnp.asarray, tree)
    return as_jnp(params), as_jnp(stats)


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
