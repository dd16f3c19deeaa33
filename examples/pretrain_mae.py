"""MAE masked-autoencoder pretraining on TPU (reference mae.py usage from
README: wrap any ViT encoder, train on reconstruction loss, then reuse the
encoder).

Synthetic data; swap `make_batch` for a real loader.  Run:
    python examples/pretrain_mae.py [steps]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time

import jax
import jax.numpy as jnp
import optax

from vit_pytorch_tpu.models.vit import ViT
from vit_pytorch_tpu.ssl.mae import MAE


def main(steps: int = 20):
    encoder = ViT(
        image_size=224, patch_size=16, num_classes=1000,
        dim=768, depth=12, heads=12, mlp_dim=3072, pool="mean",
    )
    mae = MAE(encoder=encoder, decoder_dim=512, masking_ratio=0.75,
              decoder_depth=4, decoder_heads=8)

    rng = jax.random.PRNGKey(0)
    init_rngs = {"params": rng, "mask": jax.random.PRNGKey(1)}
    params = mae.init(init_rngs, jnp.zeros((1, 3, 224, 224), jnp.float32))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    tx = optax.adamw(1.5e-4)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, imgs, step_rng):
        def loss_fn(p):
            return mae.apply(p, imgs, train=True,
                             rngs={"mask": step_rng, "dropout": step_rng})

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    def make_batch(i):
        return jax.random.normal(jax.random.PRNGKey(100 + i), (64, 3, 224, 224),
                                 jnp.bfloat16)

    step_rng = jax.random.PRNGKey(42)
    for i in range(steps):
        imgs = make_batch(i)
        step_rng, sub = jax.random.split(step_rng)
        t0 = time.time()
        params, opt, loss = train_step(params, opt, imgs, sub)
        loss = float(loss)
        print(f"step {i}: recon loss {loss:.4f}  ({(time.time() - t0) * 1000:.0f} ms)")

    # the pretrained encoder is params["params"]["encoder"] — plug it back
    # into ViT for finetuning (the encoder protocol keeps layouts identical)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
