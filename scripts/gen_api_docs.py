"""Generate a markdown API reference from docstrings.

Role of the reference's Sphinx pipeline (/root/reference/docsrc/ -> built
docs/); the image ships no Sphinx, so this is a dependency-free autogen:
one docs/api/<module>.md per module in gym_dockauv_tpu with signatures +
docstrings for every public class/function, plus an index.

Usage: python scripts/gen_api_docs.py   (regenerates docs/api/)
"""
from __future__ import annotations

import importlib
import inspect
import os
import pkgutil
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "api")
PKG = "gym_dockauv_tpu"


def _sig(obj) -> str:
    try:
        sig = str(inspect.signature(obj))
        # default-value reprs of plain objects embed memory addresses,
        # which would churn the generated files on every run
        return re.sub(r" object at 0x[0-9a-f]+", " object", sig)
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d or ""


def _public_members(mod):
    for name, obj in sorted(vars(mod).items()):
        if name.startswith("_"):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue  # re-exports are documented where they live
        if inspect.isclass(obj) or inspect.isfunction(obj):
            yield name, obj


def _class_section(name, cls, lines):
    lines.append(f"### class `{name}{_sig(cls)}`\n")
    if _doc(cls):
        lines.append(_doc(cls) + "\n")
    # dataclass-style field listing (flax struct / dataclasses)
    fields = getattr(cls, "__dataclass_fields__", None)
    if fields:
        rows = [f"- `{fn}`" for fn in fields]
        if rows:
            lines.append("Fields: " + ", ".join(f"`{fn}`" for fn in fields)
                         + "\n")
    for mname, m in sorted(vars(cls).items()):
        if mname.startswith("_") or not callable(m):
            continue
        doc = _doc(m)
        lines.append(f"#### `{name}.{mname}{_sig(m)}`\n")
        if doc:
            lines.append(doc + "\n")


def generate(out=OUT):
    os.makedirs(out, exist_ok=True)
    pkg = importlib.import_module(PKG)
    modules = [PKG]
    for m in pkgutil.walk_packages(pkg.__path__, prefix=PKG + "."):
        modules.append(m.name)
    index = ["# API reference",
             "",
             f"Generated from docstrings by `scripts/gen_api_docs.py` "
             f"(counterpart of the reference's Sphinx docsrc/).",
             ""]
    written = []
    for modname in sorted(modules):
        try:
            mod = importlib.import_module(modname)
        except Exception as e:  # optional-dep module (e.g. pygame teleop)
            print(f"skip {modname}: {e}")
            continue
        lines = [f"# `{modname}`", ""]
        if _doc(mod):
            lines.append(_doc(mod) + "\n")
        members = list(_public_members(mod))
        for name, obj in members:
            if inspect.isclass(obj):
                _class_section(name, obj, lines)
            else:
                lines.append(f"### `{name}{_sig(obj)}`\n")
                if _doc(obj):
                    lines.append(_doc(obj) + "\n")
        fname = modname.replace(".", "_") + ".md"
        with open(os.path.join(out, fname), "w") as f:
            f.write("\n".join(lines))
        written.append(fname)
        summary = (_doc(mod).splitlines() or [""])[0]
        index.append(f"- [`{modname}`]({fname}) — {summary}")
    with open(os.path.join(out, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(written)} module pages to docs/api/")
    return written


if __name__ == "__main__":
    generate()
