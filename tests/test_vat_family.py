"""VAT / VAAT / EsViT / LeJEPA smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp


def test_vat():
    from vit_pytorch_tpu.ssl.vat import ViT, VAT

    vit = ViT(image_size=32, patch_size=8, num_classes=10, dim=32, heads=2, depth=2, mlp_dim=64)
    vat = VAT(vit=vit, dim=48, depth=3, heads=2, dim_head=16, mlp_dim=96, dim_action=5,
              action_chunk_len=4, time_seq_len=2, num_views=2, num_tasks=3,
              num_advantage_bins=2, dim_extra_token=7, vit_layer_indices=(0, 1, 2))
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 3, 2, 32, 32))
    tasks = jnp.array([0, 2]); extra = jnp.ones((2, 7)); adv = jnp.array([0, 1])
    actions = jnp.zeros((2, 4, 5))
    p = vat.init(jax.random.PRNGKey(0), imgs, tasks=tasks, extra=extra, advantages=adv, actions=actions)
    loss = vat.apply(p, imgs, tasks=tasks, extra=extra, advantages=adv, actions=actions, freeze_vit=True)
    assert np.isfinite(float(loss))
    pred, hid = vat.apply(p, imgs, tasks=tasks, extra=extra, advantages=adv, return_hiddens=True)
    assert pred.shape == (2, 4, 5) and hid.shape[0] == 4

    # freeze_vit stops gradients into the backbone
    g = jax.grad(lambda p_: vat.apply(p_, imgs, tasks=tasks, extra=extra, advantages=adv,
                                      actions=actions, freeze_vit=True))(p)
    assert sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g["params"]["vit"])) == 0.0


def test_vaat():
    from vit_pytorch_tpu.ssl.vat import ViT
    from vit_pytorch_tpu.ssl.vaat import AST, VAAT

    vit = ViT(image_size=32, patch_size=8, num_classes=10, dim=32, heads=2, depth=2, mlp_dim=64)
    ast = AST(dim=24, depth=2, mlp_dim=48, patch_size=8, heads=2, dim_head=12, spec_n_fft=32, spec_win_length=16)
    vaat = VAAT(vit=vit, ast=ast, dim=48, depth=2, heads=2, dim_head=16, mlp_dim=96,
                dim_action=5, action_chunk_len=4, num_tasks=3, dim_extra_token=7)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 3, 32, 32))
    audio = jax.random.normal(jax.random.PRNGKey(2), (2, 4096))
    tasks = jnp.array([0, 2]); extra = jnp.ones((2, 7)); actions = jnp.zeros((2, 4, 5))
    p = vaat.init(jax.random.PRNGKey(0), imgs, audio, tasks=tasks, extra=extra, actions=actions)
    loss = vaat.apply(p, imgs, audio, tasks=tasks, extra=extra, actions=actions,
                      freeze_vit=True, freeze_ast=True)
    assert np.isfinite(float(loss))
    assert vaat.apply(p, imgs, audio, tasks=tasks, extra=extra).shape == (2, 4, 5)


def test_ast_standalone():
    from vit_pytorch_tpu.ssl.vaat import AST

    ast = AST(dim=24, depth=2, mlp_dim=48, num_classes=13, patch_size=8, heads=2,
              dim_head=12, spec_n_fft=32, spec_win_length=16)
    audio = jax.random.normal(jax.random.PRNGKey(0), (2, 4096))
    p = ast.init(jax.random.PRNGKey(1), audio)
    assert ast.apply(p, audio).shape == (2, 13)

    # accept_spec path
    ast2 = AST(dim=24, depth=1, mlp_dim=48, num_classes=5, patch_size=8, heads=2,
               dim_head=12, accept_spec=True)
    spec = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 17))  # (b t f)
    p2 = ast2.init(jax.random.PRNGKey(1), spec)
    assert ast2.apply(p2, spec).shape == (2, 5)


def test_siglip_vat():
    from vit_pytorch_tpu.ssl.vat_siglip import SigLIPVAT

    svat = SigLIPVAT(dim=48, depth=2, heads=2, dim_head=16, dim_action=5, mlp_dim=96,
                     action_chunk_len=4, num_tasks=3, dim_extra_token=7,
                     siglip_image_size=28, siglip_patch_size=7, siglip_dim=48,
                     siglip_depth=2, siglip_heads=4, siglip_mlp_dim=96)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 3, 28, 28))
    tasks = jnp.array([0, 2]); extra = jnp.ones((2, 7)); actions = jnp.zeros((2, 4, 5))
    p = svat.init(jax.random.PRNGKey(0), imgs, tasks=tasks, extra=extra, actions=actions)
    loss = svat.apply(p, imgs, tasks=tasks, extra=extra, actions=actions, freeze_vit=True)
    assert np.isfinite(float(loss))
    assert svat.apply(p, imgs, tasks=tasks, extra=extra).shape == (2, 4, 5)


def _tiny_hf_siglip(dim=32, mlp=64):
    rng = np.random.default_rng(0)
    hf = {
        "vision_model.embeddings.patch_embedding.weight": rng.standard_normal((dim, 3, 7, 7)).astype(np.float32),
        "vision_model.embeddings.patch_embedding.bias": np.zeros(dim, np.float32),
        "vision_model.embeddings.position_embedding.weight": rng.standard_normal((16, dim)).astype(np.float32),
        "vision_model.post_layernorm.weight": np.ones(dim, np.float32),
        "vision_model.post_layernorm.bias": np.zeros(dim, np.float32),
    }
    for nm, shp in [("layer_norm1", (dim,)), ("layer_norm2", (dim,))]:
        hf[f"vision_model.encoder.layers.0.{nm}.weight"] = np.ones(shp, np.float32)
        hf[f"vision_model.encoder.layers.0.{nm}.bias"] = np.zeros(shp, np.float32)
    for nm, shp in [("self_attn.q_proj", (dim, dim)), ("self_attn.k_proj", (dim, dim)),
                    ("self_attn.v_proj", (dim, dim)), ("self_attn.out_proj", (dim, dim)),
                    ("mlp.fc1", (mlp, dim)), ("mlp.fc2", (dim, mlp))]:
        hf[f"vision_model.encoder.layers.0.{nm}.weight"] = rng.standard_normal(shp).astype(np.float32) * 0.02
        hf[f"vision_model.encoder.layers.0.{nm}.bias"] = np.zeros(shp[0], np.float32)
    return hf


def test_load_siglip_remap():
    from vit_pytorch_tpu.ssl.vat_siglip import SigLIP, load_siglip

    depth, dim, mlp = 1, 32, 64
    params = load_siglip(_tiny_hf_siglip(dim, mlp), depth=depth)
    model = SigLIP(image_size=28, patch_size=7, dim=dim, depth=depth, heads=4, mlp_dim=mlp)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 28, 28))
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 16, dim) and np.all(np.isfinite(out))


def test_load_siglip_hub_path_mocked(tmp_path, monkeypatch):
    """load_siglip accepts an HF repo id (reference vat_siglip.py:273-285);
    the hub download is mocked — it must be requested with the reference's
    snapshot_download arguments and the downloaded file then flows through
    the normal safetensors → remap route."""
    import huggingface_hub
    from safetensors.numpy import save_file
    from vit_pytorch_tpu.ssl.vat_siglip import SigLIP, load_siglip

    depth, dim, mlp = 1, 32, 64
    fake_hub = tmp_path / "hub_model.safetensors"
    save_file(_tiny_hf_siglip(dim, mlp), str(fake_hub))

    calls = {}

    def fake_snapshot_download(repo_id, local_dir, allow_patterns):
        calls["repo_id"] = repo_id
        calls["allow_patterns"] = allow_patterns
        os = __import__("os")
        os.makedirs(local_dir, exist_ok=True)
        import shutil

        shutil.copy(fake_hub, os.path.join(local_dir, "model.safetensors"))

    monkeypatch.setattr(huggingface_hub, "snapshot_download", fake_snapshot_download)
    monkeypatch.chdir(tmp_path)

    params = load_siglip("google/siglip-so400m-patch14-224", depth=depth)
    assert calls["repo_id"] == "google/siglip-so400m-patch14-224"
    assert "model.safetensors" in calls["allow_patterns"]

    model = SigLIP(image_size=28, patch_size=7, dim=dim, depth=depth, heads=4, mlp_dim=mlp)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 28, 28))
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 16, dim) and np.all(np.isfinite(out))

    # second call: folder exists → no re-download
    calls.clear()
    load_siglip("google/siglip-so400m-patch14-224", depth=depth)
    assert not calls
