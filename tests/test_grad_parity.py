"""Gradient parity vs torch autograd (SURVEY §4 "gradient tests"): with
converted weights and an identical scalar loss, parameter gradients match the
reference's backward at fp32 tolerance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.parity
def test_vit_param_grads_match_torch(reference, torch):
    from vit_pytorch import ViT as RefViT
    from vit_pytorch_tpu.models.vit import ViT
    from vit_pytorch_tpu.utils.convert import convert_vit

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = RefViT(**kw).eval()
    x = torch.randn(2, 3, 32, 32)

    # torch backward on sum of squared logits
    out = ref(x)
    loss = (out ** 2).sum()
    loss.backward()
    t_grads = {k: p.grad.numpy() for k, p in ref.named_parameters()}

    params = convert_vit(ref.state_dict())
    model = ViT(**kw)
    xj = jnp.asarray(x.numpy())
    g = jax.grad(lambda p: jnp.sum(model.apply(p, xj) ** 2))(params)
    gp = g["params"]

    # spot-check a representative set across the depth of the network
    checks = [
        ("cls_token", gp["cls_token"], t_grads["cls_token"]),
        ("pos_embedding", gp["pos_embedding"], t_grads["pos_embedding"]),
        (
            "patch proj kernel",
            gp["patch_embedding"]["proj"]["kernel"],
            t_grads["to_patch_embedding.2.weight"].T,
        ),
        (
            "layer0 qkv",
            gp["transformer"]["layers_0_attn"]["to_qkv"]["kernel"],
            t_grads["transformer.layers.0.0.to_qkv.weight"].T,
        ),
        (
            "layer1 fc2 bias",
            gp["transformer"]["layers_1_ff"]["fc2"]["bias"],
            t_grads["transformer.layers.1.1.net.4.bias"],
        ),
        (
            "final norm scale",
            gp["transformer"]["norm"]["scale"],
            t_grads["transformer.norm.weight"],
        ),
        ("head kernel", gp["mlp_head"]["kernel"], t_grads["mlp_head.weight"].T),
    ]
    for name, got, want in checks:
        np.testing.assert_allclose(
            np.asarray(got), want, atol=5e-4, rtol=1e-3, err_msg=name
        )
