"""Capture a jax.profiler device trace of the flagship config and print an
XLA-op-level time attribution — measured evidence for the MFU-ceiling
analysis (VERDICT r3: "prove the ceiling with a profile").

Works through the axon tunnel: the device plane's "XLA Ops" line carries
per-op events with picosecond durations (verified on this box); the
tensorboard_plugin_profile converters are version-broken here, so this
parses the xplane proto directly (tensorflow.tsl xplane_pb2).

Usage:
  python tools/profile_flagship.py            # inference, bs=128, 30 iters
  python tools/profile_flagship.py --train    # train step, bs=1024
  python tools/profile_flagship.py --logdir /tmp/vit_trace --top 40
"""

import argparse
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp


def _flagship_forward(batch=128, iters=30, vitl=False):
    from vit_pytorch_tpu import ViT

    if vitl:
        # ViT-L/16 @224 bs=64 — the VERDICT r4 #5 attribution target
        # (PERF_NOTES "ViT-L width": 65.7% of roofline on the two-step path)
        model = ViT(image_size=224, patch_size=16, num_classes=1000,
                    dim=1024, depth=24, heads=16, mlp_dim=4096)
        batch = 64
    else:
        model = ViT(image_size=224, patch_size=16, num_classes=1000, dim=768,
                    depth=12, heads=12, mlp_dim=3072)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (batch, 3, 224, 224), jnp.bfloat16)
    params = model.init(rng, img[:1].astype(jnp.float32))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def loop(params, img):
        def body(i, acc):
            out = model.apply(params, img * (1.0 + i.astype(jnp.bfloat16) * 1e-6))
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return lambda: float(loop(params, img)), batch * iters


def _flagship_train(batch=1024):
    import optax

    from vit_pytorch_tpu import ViT

    model = ViT(image_size=224, patch_size=16, num_classes=1000, dim=768,
                depth=12, heads=12, mlp_dim=3072, remat=True)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (batch, 3, 224, 224), jnp.bfloat16)
    labels = jnp.zeros((batch,), jnp.int32)
    params = model.init(rng, img[:1].astype(jnp.float32))["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, img, labels):
        def loss_fn(p):
            logits = model.apply({"params": p}, img)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    state = {}

    def run():
        p, s, loss = step(state.get("p", params), state.get("s", opt_state),
                          img, labels)
        state["p"], state["s"] = p, s
        return float(loss)

    return run, batch


_OPCODE_RE = re.compile(r"^%[\w.\-]+(?:\.\d+)? = .*? ([a-z][\w\-]*)\(")
_NAME_RE = re.compile(r"^%([\w.\-]+) =")


def _classify(hlo: str) -> str:
    """Bucket an HLO op string: pallas custom-calls by kernel, fusions by
    root opcode hint, the rest by opcode."""
    if "custom-call" in hlo:
        m = re.search(r'custom_call_target="([^"]+)"', hlo)
        tgt = m.group(1) if m else "custom-call"
        nm = _NAME_RE.match(hlo)
        return f"custom-call:{tgt}" if "tpu" in tgt or "Mosaic" in tgt else (
            f"custom-call:{nm.group(1) if nm else tgt}"
        )
    m = _OPCODE_RE.match(hlo)
    op = m.group(1) if m else hlo.split(" ")[0].lstrip("%")
    if op == "fusion":
        kind = re.search(r"kind=k(\w+)", hlo)
        # convolution/dot inside? cheap hint from the call name
        root = re.search(r"calls=%([\w.\-]+)", hlo)
        return f"fusion:{kind.group(1) if kind else '?'}"
    return op


def analyze(logdir: str, top: int = 25):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    sp = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        sp.ParseFromString(f.read())

    dev = next((p for p in sp.planes if p.name.startswith("/device:TPU")), None)
    if dev is None:
        raise SystemExit("no TPU device plane in the trace")

    op_line = next((l for l in dev.lines if l.name == "XLA Ops"), None)
    mod_line = next((l for l in dev.lines if l.name == "XLA Modules"), None)

    total_ps = 0
    by_op = collections.Counter()
    by_cat = collections.Counter()
    count = collections.Counter()
    shape_re = re.compile(r"= ((?:\([^)]*\))|(?:\w+\[[\d,]*\]))")
    for e in op_line.events:
        hlo = dev.event_metadata[e.metadata_id].name
        nm = _NAME_RE.match(hlo)
        name = re.sub(r"\.\d+$", "", nm.group(1)) if nm else hlo[:40]
        # control-flow wrappers ENCLOSE their body ops — counting them
        # would double every ps spent inside a fori_loop
        if re.search(r"\) (while|conditional|call)\(", hlo):
            continue
        sh = shape_re.search(hlo)
        # (base name, output shape) so the 12 per-layer clones aggregate but
        # distinct GEMMs/fusions stay distinguishable
        key = f"{name} -> {sh.group(1) if sh else '?'}"
        by_op[key] += e.duration_ps
        by_cat[_classify(hlo)] += e.duration_ps
        count[key] += 1
        total_ps += e.duration_ps

    mod_ps = sum(e.duration_ps for e in mod_line.events) if mod_line else 0
    span_ps = 0
    if mod_line and mod_line.events:
        start = min(e.offset_ps for e in mod_line.events)
        end = max(e.offset_ps + e.duration_ps for e in mod_line.events)
        span_ps = end - start

    us = lambda ps: ps / 1e6
    print(f"trace: {paths[-1]}")
    print(f"device op time   : {us(total_ps):12.1f} us")
    if mod_ps:
        print(f"module exec time : {us(mod_ps):12.1f} us")
    if span_ps:
        print(f"wall span        : {us(span_ps):12.1f} us "
              f"(duty cycle {mod_ps / span_ps * 100:.1f}%)")
    print(f"\n-- by category ({len(by_cat)}) --")
    for cat, ps in by_cat.most_common():
        print(f"{us(ps):12.1f} us  {ps / total_ps * 100:5.1f}%  {cat}")
    print(f"\n-- top {top} ops --")
    for key, ps in by_op.most_common(top):
        print(f"{us(ps):12.1f} us  {ps / total_ps * 100:5.1f}%  x{count[key]:<5d} {key}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--vitl", action="store_true",
                    help="profile ViT-L/16 @224 bs=64 instead of ViT-B")
    ap.add_argument("--logdir", default="/tmp/vit_flagship_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--analyze-only", action="store_true",
                    help="skip capture; analyze an existing logdir")
    args = ap.parse_args()

    if not args.analyze_only:
        run, _ = (
            _flagship_train() if args.train
            else _flagship_forward(vitl=args.vitl)
        )
        run()  # compile + warm
        run()
        with jax.profiler.trace(args.logdir):
            run()
    analyze(args.logdir, args.top)


if __name__ == "__main__":
    main()
