"""Generate the API reference from docstrings (docs/reference/).

The reference builds a Documenter.jl site from its docstrings
(/root/reference/docs/make.jl:5-16); this is the equivalent pipeline for
the TPU build, dependency-free: walk the public surface of `tfhe_tpu`,
emit one markdown file per module (signatures + docstrings verbatim) and
an index. CI regenerates and fails on drift (`--check`), the same role as
the reference's docs job in .circleci/config.yml.

Usage:
    python tools/gen_api_docs.py          # (re)write docs/reference/
    python tools/gen_api_docs.py --check  # fail if docs/reference is stale
"""

from __future__ import annotations

import importlib
import inspect
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODULES = [
    "tfhe_tpu",
    "tfhe_tpu.params",
    "tfhe_tpu.api",
    "tfhe_tpu.gates",
    "tfhe_tpu.numeric",
    "tfhe_tpu.polynomial",
    "tfhe_tpu.lwe",
    "tfhe_tpu.tlwe",
    "tfhe_tpu.tgsw",
    "tfhe_tpu.keyswitch",
    "tfhe_tpu.bootstrap",
    "tfhe_tpu.noise",
    "tfhe_tpu.debug",
    "tfhe_tpu.tuning",
    "tfhe_tpu.pbs",
    "tfhe_tpu.radix",
    "tfhe_tpu.circuits",
    "tfhe_tpu.netlist",
    "tfhe_tpu.compressed",
    "tfhe_tpu.public",
    "tfhe_tpu.rekey",
    "tfhe_tpu.mk",
    "tfhe_tpu.mk.api",
    "tfhe_tpu.mk.internals",
    "tfhe_tpu.mk.gates",
    "tfhe_tpu.parallel.mesh",
    "tfhe_tpu.parallel.multihost",
    "tfhe_tpu.ops.conv",
    "tfhe_tpu.ops.karatsuba",
    "tfhe_tpu.ops.pallas_cmux",
    "tfhe_tpu.utils.serialization",
    "tfhe_tpu.utils.jobs",
    "tfhe_tpu.utils.profiling",
    "tfhe_tpu.utils.telemetry",
    "tfhe_tpu.utils.sync",
]


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    doc = inspect.getdoc(obj)
    return doc.strip() if doc else "*(no docstring)*"


def _public_members(mod):
    """Public functions/classes DEFINED in (or re-exported by) the module."""
    out = []
    for name, obj in vars(mod).items():
        if name.startswith("_"):
            continue
        if inspect.ismodule(obj):
            continue
        if not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        owner = getattr(obj, "__module__", "")
        if not owner.startswith("tfhe_tpu"):
            continue
        if mod.__name__ != "tfhe_tpu" and owner != mod.__name__:
            continue  # submodule pages list only their own definitions
        out.append((name, obj))
    return sorted(out)


def render_module(mod_name: str) -> str:
    mod = importlib.import_module(mod_name)
    lines = [f"# `{mod_name}`", ""]
    mod_doc = inspect.getdoc(mod)
    if mod_doc:
        lines += [mod_doc.strip(), ""]
    for name, obj in _public_members(mod):
        kind = "class" if inspect.isclass(obj) else "def"
        lines += [f"### `{kind} {name}{_signature(obj)}`", "",
                  _doc(obj), ""]
        if inspect.isclass(obj):
            for mname, mobj in sorted(vars(obj).items()):
                if mname.startswith("_") or not inspect.isfunction(mobj):
                    continue
                lines += [f"**`.{mname}{_signature(mobj)}`** — "
                          f"{_doc(mobj).splitlines()[0]}", ""]
    lines += [""]
    return "\n".join(lines)


def generate(out_dir: str) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    files = {}
    index = ["# API reference (generated)", "",
             "Regenerate with `python tools/gen_api_docs.py`; CI checks for"
             " drift (the reference's Documenter-site equivalent,"
             " /root/reference/docs/make.jl:5-16).", ""]
    for mod_name in MODULES:
        fname = mod_name.replace(".", "_") + ".md"
        files[fname] = render_module(mod_name)
        index.append(f"- [`{mod_name}`]({fname})")
    index.append("")
    files["index.md"] = "\n".join(index)
    for fname, text in files.items():
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write(text)
    return files


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    target = os.path.join(repo, "docs", "reference")
    if "--check" in sys.argv:
        with tempfile.TemporaryDirectory() as tmp:
            fresh = generate(tmp)
        stale = []
        for fname, text in fresh.items():
            path = os.path.join(target, fname)
            if not os.path.exists(path) or open(path).read() != text:
                stale.append(fname)
        if stale:
            print("STALE generated docs:", ", ".join(sorted(stale)))
            print("run: python tools/gen_api_docs.py")
            sys.exit(1)
        print(f"docs/reference up to date ({len(fresh)} files)")
        return
    files = generate(target)
    print(f"wrote {len(files)} files to {target}")


if __name__ == "__main__":
    main()
