"""Multi-kernel CNN Q-network — flax re-design of the reference DQNModel.

Topology mirrors /root/reference/Deep_QLearning/main_dir/
Dqn8TestNOPERCNN.py:202-246: three multi-kernel conv blocks (four parallel
convs with kernel sizes 1/2/3/4, each ``features/4`` filters, SAME padding,
concatenated, ReLU), then Flatten -> Dense(1024, relu) -> Dropout(0.5) ->
Dense(4, linear).

TPU-first deltas from the reference (documented, intentional):

* Input is NHWC ``(B, 4, 4, 16)`` — the TPU-native layout — instead of the
  reference's channels-first ``(1, 16, 4, 4)`` (Dqn8:276-277). The
  operation is identical modulo layout.
* The 16-channel one-hot encoding of log2 tile values
  (``DQNAgent.encode_state``, Dqn8:271-277) is fused into the module: the
  board is stored as int8 exponents everywhere, so "encoding" is a single
  ``jax.nn.one_hot`` on device, not a host preprocessing step.
* Convolutions and dense layers compute in bfloat16 on the MXU with
  float32 parameters and a float32 output head.
* The reference's per-block double ReLU (``conv_block`` ends in ReLU and
  ``_build_model`` adds another, Dqn8:213-218,246) is idempotent and
  collapsed to one.

Parameter count: 96.77M per network (the reference's "~198M" docstring,
Dqn8:17, counts roughly the online+target pair).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

NUM_TILE_CHANNELS = 16  # one-hot depth, Dqn8:274


class MultiKernelConvBlock(nn.Module):
    """Four parallel convs (k=1..4), concat, ReLU (Dqn8:234-246).

    Parameters stay four logical kernels (reference topology), but the
    computation runs as ONE 4x4 convolution with padding ((1,2),(1,2)) and
    the smaller kernels zero-embedded at their SAME-padding offsets — an
    exact algebraic fusion that turns 4 MXU launches into 1:
      k=1 -> tap [1,1]; k=2 -> taps [1:3,1:3]; k=3 -> taps [0:3,0:3];
      k=4 -> all taps (TF/XLA SAME pads more at the end, so pad_before for
      k=4 on a size-4 axis is 1 and for k=2 is 0).
    ``fused=False`` keeps the literal 4-conv computation (used to verify
    equivalence in tests).
    """

    features: int = 2048
    dtype: Any = jnp.bfloat16
    fused: bool = True

    @nn.compact
    def __call__(self, x):
        d = self.features // 4
        in_ch = x.shape[-1]
        kernels = []
        biases = []
        for k in (1, 2, 3, 4):
            kernels.append(
                self.param(
                    f"conv{k}x{k}_kernel",
                    nn.initializers.lecun_normal(),
                    (k, k, in_ch, d),
                    jnp.float32,
                )
            )
            biases.append(
                self.param(
                    f"conv{k}x{k}_bias", nn.initializers.zeros, (d,), jnp.float32
                )
            )
        if not self.fused:
            outs = []
            pads = {1: (0, 0), 2: (0, 1), 3: (1, 1), 4: (1, 2)}
            for k, w, b in zip((1, 2, 3, 4), kernels, biases):
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype),
                    w.astype(self.dtype),
                    window_strides=(1, 1),
                    padding=(pads[k], pads[k]),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                outs.append(y + b.astype(self.dtype))
            return nn.relu(jnp.concatenate(outs, axis=-1))

        # Zero-embed each kernel into the 4x4 frame at its SAME offset.
        w = jnp.zeros((4, 4, in_ch, 4 * d), jnp.float32)
        w = w.at[1:2, 1:2, :, 0:d].set(kernels[0])
        w = w.at[1:3, 1:3, :, d : 2 * d].set(kernels[1])
        w = w.at[0:3, 0:3, :, 2 * d : 3 * d].set(kernels[2])
        w = w.at[:, :, :, 3 * d :].set(kernels[3])
        b = jnp.concatenate(biases)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(1, 1),
            padding=((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return nn.relu(y + b.astype(self.dtype))


class DQNCNN(nn.Module):
    """Q-network over int8 exponent boards -> (B, 4) f32 Q-values."""

    action_space: int = 4
    features: int = 2048
    hidden: int = 1024
    dropout_rate: float = 0.5
    num_blocks: int = 3
    dtype: Any = jnp.bfloat16
    fused: bool = True

    @nn.compact
    def __call__(self, boards, *, train: bool = False):
        # boards: (B, 4, 4) int8 exponents; one-hot = the reference's
        # encode_state done on device (Dqn8:271-277).
        x = jax.nn.one_hot(
            boards.astype(jnp.int32), NUM_TILE_CHANNELS, dtype=self.dtype
        )
        for i in range(self.num_blocks):
            x = MultiKernelConvBlock(
                features=self.features,
                dtype=self.dtype,
                fused=self.fused,
                name=f"block{i}",
            )(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="dense")(x))
        x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        q = nn.Dense(
            self.action_space,
            dtype=jnp.float32,
            name="head",
        )(x)
        return q.astype(jnp.float32)


def create_model(config) -> DQNCNN:
    """Build the network from a DQNConfig-like object."""
    return DQNCNN(
        action_space=4,
        features=config.features,
        hidden=config.hidden,
        dropout_rate=config.dropout,
        num_blocks=config.num_blocks,
        dtype=jnp.bfloat16 if config.bf16 else jnp.float32,
        # Default False to match DQNConfig.fused_conv: the fused variant
        # measured 1.77x SLOWER in production (agents/dqn.py:73-77), so a
        # duck-typed config without the attribute must get the fast path.
        fused=getattr(config, "fused_conv", False),
    )


def init_params(model: DQNCNN, key):
    dummy = jnp.zeros((1, 4, 4), jnp.int8)
    return model.init({"params": key}, dummy, train=False)["params"]


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
