"""Generate docs/PARITY_MAP.md: one row per reference module mapping it to
this repo's TPU-native module and the tests that exercise the pair.

Run from the repo root:  python tools/gen_parity_map.py
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/vit_pytorch"
SUBPKGS = ("models", "ssl", "wrappers")

# reference modules whose TPU-native home isn't the same-stem file
EXTRA_HOMES = {
    # packing/flash live in ops/ because the packed NaViT path is a
    # kernel-level redesign, not a file-for-file port
    "na_vit": ["vit_pytorch_tpu/models/na_vit.py", "vit_pytorch_tpu/ops/packing.py"],
}


def find_home(stem: str):
    if stem in EXTRA_HOMES:
        return EXTRA_HOMES[stem]
    for sub in SUBPKGS:
        path = f"vit_pytorch_tpu/{sub}/{stem}.py"
        if os.path.exists(os.path.join(REPO, path)):
            return [path]
    return []


# modules re-exported at the package top level (vit_pytorch_tpu/__init__.py),
# so tests may import the class without the dotted submodule path
REEXPORTS = {
    "vit": "ViT",
    "simple_vit": "SimpleViT",
    "mae": "MAE",
    "dino": "Dino",
}


def find_tests(stem: str, homes):
    """Tests that import one of the row's mapped modules by dotted path,
    construct the import from the quoted module stem (test_parity5's
    ``_simple_family`` helper builds ``importlib``-style paths from
    strings), or — for top-level re-exports — import the class name.
    Keyed on the actual ``homes`` so an unmapped row can never show test
    evidence."""
    pats = []
    for home in homes:
        dotted = home[: -len(".py")].replace("/", r"\.")
        pats.append(re.compile(rf"{dotted}\b"))
        mod_stem = os.path.basename(home)[: -len(".py")]
        # exact quoted stem, e.g. "simple_vit_with_qk_norm" passed to a
        # string-constructing helper; word-exact inside the quotes so
        # "vit" can't match "simple_vit..."
        pats.append(re.compile(rf"""["']{re.escape(mod_stem)}["']"""))
    if stem in REEXPORTS:
        pats.append(
            re.compile(
                rf"from vit_pytorch_tpu import [^\n]*\b{REEXPORTS[stem]}\b"
            )
        )
    if not pats:
        return []
    hits = set()
    tdir = os.path.join(REPO, "tests")
    for fname in sorted(os.listdir(tdir)):
        if not fname.endswith(".py"):
            continue
        text = open(os.path.join(tdir, fname)).read()
        if any(p.search(text) for p in pats):
            hits.add(fname)
    return sorted(hits)


def main():
    stems = sorted(
        f[:-3]
        for f in os.listdir(REF)
        if f.endswith(".py") and f != "__init__.py"
    )
    rows, missing, untested = [], [], []
    for stem in stems:
        homes = find_home(stem)
        tests = find_tests(stem, homes)
        if not homes:
            missing.append(stem)
        if homes and not tests:
            untested.append(stem)
        rows.append((stem, homes, tests))

    out = os.path.join(REPO, "docs", "PARITY_MAP.md")
    with open(out, "w") as f:
        f.write(
            "# Parity map — reference module → TPU-native module → tests\n\n"
            "Machine-generated (`python tools/gen_parity_map.py`); one row per\n"
            "`.py` in `/root/reference/vit_pytorch/`.  \"Tests\" lists every\n"
            "file under `tests/` importing the TPU module by dotted path —\n"
            "the parity/equivalence evidence for that row.  Shared-infrastructure\n"
            "tests (block library, kernels, converter) cover all rows and are\n"
            "not repeated per row.\n\n"
            "| reference | TPU-native module | tests |\n|---|---|---|\n"
        )
        for stem, homes, tests in rows:
            home_s = "<br>".join(f"`{h}`" for h in homes) if homes else "**MISSING**"
            test_s = ", ".join(f"`{t}`" for t in tests) if tests else "—"
            f.write(f"| `vit_pytorch/{stem}.py` | {home_s} | {test_s} |\n")
        f.write(
            f"\n{len(rows)} reference modules; "
            f"{len(rows) - len(missing)} mapped, {len(missing)} missing.\n"
        )
        if missing:
            f.write("\nMissing: " + ", ".join(missing) + "\n")
        if untested:
            f.write(
                "\nMapped but with no test importing the module directly: "
                + ", ".join(untested)
                + "\n"
            )
    print(f"wrote {out}: {len(rows)} rows, {len(missing)} missing, "
          f"{len(untested)} without direct-import tests")
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
