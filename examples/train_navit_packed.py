"""NaViT packed variable-resolution training on TPU.

The TPU-native replacement for the reference's Python-list batching
(na_vit.py:289-343): images of arbitrary resolutions are greedily packed on
the host into fixed-shape token buffers (static shapes → one XLA program),
and attention uses the Pallas flash kernel with segment-id block-diagonal
masking + cross-segment tile skipping (ops/flash_attention.py).

Synthetic data; swap `sample_images` for a real loader.  Run:
    python examples/train_navit_packed.py [steps]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vit_pytorch_tpu.models.na_vit import NaViT
from vit_pytorch_tpu.ops.packing import pack_images

PATCH = 16
MAX_SEQ = 1024
NUM_CLASSES = 100
RESOLUTIONS = [(256, 256), (224, 224), (160, 256), (256, 160), (128, 128), (96, 192)]


def sample_images(rng: np.random.Generator, n: int):
    """n random-resolution images + labels (stand-in for a real dataset)."""
    images, labels = [], []
    for _ in range(n):
        h, w = RESOLUTIONS[rng.integers(len(RESOLUTIONS))]
        images.append(rng.normal(size=(3, h, w)).astype(np.float32))
        labels.append(int(rng.integers(NUM_CLASSES)))
    return images, np.asarray(labels, np.int32)


def main(steps: int = 20):
    model = NaViT(
        image_size=256,
        patch_size=PATCH,
        num_classes=NUM_CLASSES,
        dim=384,
        depth=6,
        heads=6,
        mlp_dim=1536,
        token_dropout_prob=0.1,
    )

    host_rng = np.random.default_rng(0)

    def make_batch(train: bool):
        images, labels = sample_images(host_rng, 32)
        packed = pack_images(
            images,
            patch_size=PATCH,
            max_seq_len=MAX_SEQ,
            token_dropout_prob=0.1 if train else None,
            train=train,
            rng=host_rng,
            # static shapes: pad the pack count and per-pack image count so
            # every step compiles to the same XLA program
            pad_groups_to=8,
            max_images=8,
        )
        # scatter labels into the (packs, max_images) layout, -1 where padded
        lab = np.full((packed.patches.shape[0], packed.max_images), -1, np.int32)
        idx = 0
        for g in range(packed.patches.shape[0]):
            for s in range(packed.max_images):
                if np.asarray(packed.num_images)[g] > s:
                    lab[g, s] = labels[idx]
                    idx += 1
        return packed, jnp.asarray(lab)

    packed0, _ = make_batch(train=True)
    # jitted single-pack init: parameter shapes don't depend on batch, and
    # eager full-batch init can RESOURCE_EXHAUST the remote chip (see
    # utils/helpers.py jit_init)
    from vit_pytorch_tpu.utils.helpers import jit_init

    packed0 = jax.tree.map(
        lambda x: x[:1] if hasattr(x, "ndim") and getattr(x, "ndim", 0) else x,
        packed0,
    )
    params = jit_init(
        model,
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        packed0,
        train=False,
    )
    tx = optax.adamw(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, packed, labels, rng):
        def loss_fn(params):
            logits = model.apply(
                params, packed, train=True, rngs={"dropout": rng}
            )  # (packs, max_images, classes)
            valid = labels >= 0
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.maximum(labels, 0)
            )
            return jnp.sum(losses * valid) / jnp.maximum(jnp.sum(valid), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(42)
    for step in range(steps):
        packed, labels = make_batch(train=True)
        rng, sub = jax.random.split(rng)
        t0 = time.time()
        params, opt_state, loss = train_step(params, opt_state, packed, labels, sub)
        loss = float(loss)
        print(f"step {step}: loss {loss:.4f}  ({(time.time() - t0) * 1000:.0f} ms)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
