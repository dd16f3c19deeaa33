"""DINO self-distillation pretraining on TPU.

The reference's in-place teacher EMA and center `copy_` buffers
(dino.py:80-83, 299-300) become explicit functional state here: ``DinoState``
is a pytree carried through the loop, the teacher update is a pure function,
and the augmentation RNG is threaded explicitly.

Synthetic data; swap `make_batch` for a real loader.  Run:
    python examples/pretrain_dino.py [steps]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp
import optax

from vit_pytorch_tpu.models.vit import ViT
from vit_pytorch_tpu.ssl.dino import Dino, dino_forward


def main(steps: int = 20):
    net = ViT(image_size=96, patch_size=16, num_classes=1000, dim=384, depth=6,
              heads=6, mlp_dim=1536)
    dino = Dino(
        net=net,
        image_size=96,
        num_classes_K=4096,
        projection_hidden_size=512,
        projection_layers=3,
    )

    imgs0 = jnp.zeros((2, 3, 96, 96), jnp.float32)
    params = dino.init({"params": jax.random.PRNGKey(0)}, imgs0)
    state = dino.create_state(params)
    tx = optax.adamw(3e-4)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, state, opt, imgs, rng):
        (loss, new_last), grads = jax.value_and_grad(
            lambda p: dino_forward(dino, p, state, imgs, rng), has_aux=True
        )(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        state = state.replace(last_teacher_centers=new_last)
        # EMA teacher + center updates are pure pytree ops — jit-compatible
        state = dino.update_moving_average(params, state)
        return params, state, opt, loss

    rng = jax.random.PRNGKey(42)
    for i in range(steps):
        imgs = jax.random.uniform(jax.random.PRNGKey(100 + i), (32, 3, 96, 96))
        rng, sub = jax.random.split(rng)
        t0 = time.time()
        params, state, opt, loss = train_step(params, state, opt, imgs, sub)
        loss = float(loss)
        print(f"step {i}: dino loss {loss:.4f}  ({(time.time() - t0) * 1000:.0f} ms)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
