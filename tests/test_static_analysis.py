"""Static-analysis harness — the reference wires cppcheck, clang-tidy and
ASan/UBSan builds into its CMake presets (/root/reference/CMakePresets.json:33-47,
ci-sanitize block). This is the rebuild's equivalent, built from the tools
actually present in the image:

* a stdlib-AST lint over every package source (unused imports, unused local
  variables, builtin shadowing, mutable default args, bare excepts,
  f-strings without placeholders, `== None`, duplicate top-level defs) —
  the pyflakes/ruff subset that catches real rot, reimplemented on the
  stdlib because ruff/mypy cannot be installed in this image;
* `-Wall -Wextra -Werror` and ASan+UBSan builds of the native C++, with the
  sanitized binary exercised on its real entry points.

ruff/mypy configs are shipped in pyproject.toml for environments that have
the tools; when present they run here too.
"""

from __future__ import annotations

import ast
import ctypes
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

PKG = Path(__file__).resolve().parent.parent / "satellite_approximation_tpu"
REPO = PKG.parent

SOURCES = sorted(PKG.rglob("*.py")) + [
    REPO / "bench.py",
    REPO / "__graft_entry__.py",
]


class _Lint(ast.NodeVisitor):
    def __init__(self, tree: ast.AST, source: str) -> None:
        self.problems: list[str] = []
        self.imported: dict[str, int] = {}
        self.used: set[str] = set()
        self.toplevel_defs: dict[str, int] = {}
        self.source = source
        self.visit(tree)
        for name, lineno in self.imported.items():
            if name not in self.used and not name.startswith("_"):
                self.problems.append(f"{lineno}: unused import '{name}'")

    # --- imports and usage tracking ---
    def visit_Import(self, node: ast.Import) -> None:
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imported[name] = node.lineno

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                continue
            self.imported[a.asname or a.name] = node.lineno

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, ast.Load):
            self.used.add(node.id)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.generic_visit(node)

    # --- defect patterns ---
    def _check_defaults(self, node) -> None:
        for d in list(node.args.defaults) + list(node.args.kw_defaults):
            if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                self.problems.append(
                    f"{node.lineno}: mutable default argument in '{node.name}'"
                )

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_AsyncFunctionDef(self, node: ast.AsyncFunctionDef) -> None:
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_ExceptHandler(self, node: ast.ExceptHandler) -> None:
        if node.type is None:
            self.problems.append(f"{node.lineno}: bare 'except:'")
        self.generic_visit(node)

    def visit_Compare(self, node: ast.Compare) -> None:
        for op, comp in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Eq, ast.NotEq)) and (
                isinstance(comp, ast.Constant) and comp.value is None
            ):
                self.problems.append(f"{node.lineno}: use 'is None', not '== None'")
        self.generic_visit(node)

    def visit_JoinedStr(self, node: ast.JoinedStr) -> None:
        if not any(isinstance(v, ast.FormattedValue) for v in node.values):
            self.problems.append(f"{node.lineno}: f-string without placeholders")
        self.generic_visit(node)

    def visit_FormattedValue(self, node: ast.FormattedValue) -> None:
        # Do not descend into format specs — they are JoinedStr nodes made
        # of constants and would false-positive the check above.
        self.visit(node.value)


# builtins whose shadowing reliably indicates a mistake (ruff A001-A002
# subset — conservative: excludes names like `input`/`filter`/`type` that
# scientific code sometimes uses deliberately as parameters)
_SHADOW_BUILTINS = {
    "list", "dict", "set", "tuple", "str", "int", "float", "bool",
    "len", "all", "any", "map", "zip", "print", "open", "object",
    "Exception", "BaseException", "True", "False", "None",
}


def _unused_locals(fn: ast.FunctionDef | ast.AsyncFunctionDef) -> list[str]:
    """pyflakes F841 subset: locals assigned by a simple `name = ...` and
    never loaded anywhere in the function (including nested scopes). Tuple
    unpacking, augmented assignment, loop targets, `_`-prefixed names, and
    functions using locals()/eval are all exempt — the false-positive-free
    core of the check."""
    loaded: set[str] = set()
    stored: dict[str, int] = {}
    dynamic = False
    for node in ast.walk(fn):
        if isinstance(node, ast.Name):
            if isinstance(node.ctx, ast.Load):
                loaded.add(node.id)
                if node.id in ("locals", "eval", "exec", "vars"):
                    dynamic = True
        elif isinstance(node, (ast.Global, ast.Nonlocal)):
            for n in node.names:
                loaded.add(n)
        elif isinstance(node, ast.Assign) and len(node.targets) == 1:
            t = node.targets[0]
            if isinstance(t, ast.Name) and not t.id.startswith("_"):
                stored.setdefault(t.id, node.lineno)
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            if isinstance(node.target, ast.Name) and not node.target.id.startswith("_"):
                stored.setdefault(node.target.id, node.lineno)
    if dynamic:
        return []
    return [
        f"{lineno}: unused local '{name}' in '{fn.name}'"
        for name, lineno in sorted(stored.items(), key=lambda kv: kv[1])
        if name not in loaded
    ]


def _builtin_shadows(tree: ast.AST) -> list[str]:
    """ruff A001/A002 subset: function parameters or simple assignments that
    shadow a core builtin."""
    out = []
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            args = node.args
            every = (
                list(args.posonlyargs) + list(args.args)
                + list(args.kwonlyargs)
                + ([args.vararg] if args.vararg else [])
                + ([args.kwarg] if args.kwarg else [])
            )
            for a in every:
                if a.arg in _SHADOW_BUILTINS:
                    out.append(
                        f"{node.lineno}: parameter '{a.arg}' of '{node.name}' "
                        "shadows a builtin"
                    )
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id in _SHADOW_BUILTINS:
                    out.append(f"{node.lineno}: assignment shadows builtin '{t.id}'")
    return out


def _module_lint(path: Path) -> list[str]:
    src = path.read_text()
    tree = ast.parse(src, filename=str(path))
    lint = _Lint(tree, src)
    if path.name == "__init__.py":
        # Re-export modules: names in __all__ (or simply re-exported) are
        # used by importers, not locally.
        lint.problems = [p for p in lint.problems if "unused import" not in p]
    # duplicate top-level defs shadow silently
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen:
                lint.problems.append(
                    f"{node.lineno}: duplicate top-level def '{node.name}' "
                    f"(first at {seen[node.name]})"
                )
            seen[node.name] = node.lineno
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            lint.problems.extend(_unused_locals(node))
    lint.problems.extend(_builtin_shadows(tree))
    return [f"{path.relative_to(REPO)}:{p}" for p in lint.problems]


class TestPythonLint:
    def test_all_sources_parse_and_lint_clean(self):
        assert len(SOURCES) > 30, "source discovery broke"
        problems: list[str] = []
        for path in SOURCES:
            problems.extend(_module_lint(path))
        assert not problems, "lint findings:\n" + "\n".join(problems)

    def test_ruff_if_available(self):
        if shutil.which("ruff") is None:
            pytest.skip("ruff not installed in this image")
        res = subprocess.run(
            ["ruff", "check", str(PKG)], capture_output=True, text=True
        )
        assert res.returncode == 0, res.stdout + res.stderr

    def test_mypy_if_available(self):
        if shutil.which("mypy") is None:
            pytest.skip("mypy not installed in this image")
        res = subprocess.run(
            ["mypy", str(PKG)], capture_output=True, text=True
        )
        assert res.returncode == 0, res.stdout + res.stderr


NATIVE_SRC = PKG / "native" / "src" / "satnative.cpp"


class TestNativeSanitizers:
    """The reference's ci-sanitize/-Werror presets, applied to our C++."""

    def test_warnings_as_errors(self, tmp_path):
        if shutil.which("g++") is None:
            pytest.skip("no g++")
        res = subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-Wall", "-Wextra", "-Werror", "-Wshadow", "-Wconversion",
             "-fopenmp",
             str(NATIVE_SRC), "-o", str(tmp_path / "strict.so")],
            capture_output=True, text=True, timeout=180,
        )
        assert res.returncode == 0, res.stderr

    def test_asan_ubsan_run(self, tmp_path):
        if shutil.which("g++") is None:
            pytest.skip("no g++")
        so = tmp_path / "san.so"
        res = subprocess.run(
            ["g++", "-O1", "-g", "-shared", "-fPIC", "-std=c++17",
             "-fsanitize=address,undefined", "-fno-omit-frame-pointer",
             str(NATIVE_SRC), "-o", str(so)],
            capture_output=True, text=True, timeout=180,
        )
        assert res.returncode == 0, res.stderr
        # Drive both native entry points under the sanitizers in a child
        # process (ASan must be loaded first, so not in-process here).
        code = f"""
import ctypes, numpy as np
lib = ctypes.CDLL({str(so)!r})
h, w = 64, 57
rng = np.random.default_rng(0)
mask = (rng.random((h, w)) > 0.4).astype(np.uint8)
labels = np.zeros(h * w, np.int32)
lib.flood_partition.restype = ctypes.c_int32
n = lib.flood_partition(
    mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.c_int32(h), ctypes.c_int32(w), ctypes.c_int32(1),
    labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
assert n >= 1
surf = rng.random((256, 256)).astype(np.float32)
holes = (rng.random((256, 256)) > 0.9).astype(np.uint8)
surf[holes.astype(bool)] = 0
lib.hole_fill(
    surf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    holes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.c_int32(256))
assert np.isfinite(surf).all()

f32p = ctypes.POINTER(ctypes.c_float)
u8p = ctypes.POINTER(ctypes.c_uint8)
orig = rng.random((h, w)).astype(np.float32)
filled = np.empty_like(orig)
lib.pit_fill_flood(orig.ctypes.data_as(f32p), filled.ctypes.data_as(f32p),
                   ctypes.c_int32(h), ctypes.c_int32(w), ctypes.c_float(0.3))
assert (filled >= orig).all()

alpha = rng.random((h, w)).astype(np.float32)
beta = rng.random((h, w)).astype(np.float32)
shadow = (rng.random((h, w)) > 0.7).astype(np.uint8)
divs = np.asarray([8, 16, 32, 64, 128], np.int32)
total = int((divs.astype(np.int64) ** 2).sum())
counts = np.zeros(total, np.int64)
sums = np.zeros(total, np.float64)
lib.prob_histograms(
    alpha.ctypes.data_as(f32p), beta.ctypes.data_as(f32p),
    shadow.ctypes.data_as(u8p), ctypes.c_int64(alpha.size),
    divs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ctypes.c_int32(5),
    counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    sums.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
assert counts.sum() == alpha.size * 5

ext = rng.random((258, 258)).astype(np.float32)
obj = (rng.random((h, w)) > 0.9).astype(np.uint8)
cloud = (rng.random((h, w)) > 0.9).astype(np.uint8)
out = np.empty((h, w), np.uint8)
lib.final_mask_sample(
    alpha.ctypes.data_as(f32p), beta.ctypes.data_as(f32p),
    ext.ctypes.data_as(f32p), ctypes.c_int32(258),
    obj.ctypes.data_as(u8p), cloud.ctypes.data_as(u8p),
    ctypes.c_float(0.15), ctypes.c_int64(alpha.size),
    out.ctypes.data_as(u8p))
assert set(np.unique(out)) <= {{0, 1}}
print("SANITIZED-OK")
"""
        env = {"PATH": "/usr/bin:/bin", "ASAN_OPTIONS": "detect_leaks=0",
               "LD_PRELOAD": _asan_rt() or ""}
        run = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=300, env=env,
        )
        assert "SANITIZED-OK" in run.stdout, run.stdout + run.stderr


def _asan_rt() -> str | None:
    """Path of libasan for LD_PRELOAD (python itself isn't sanitized)."""
    try:
        out = subprocess.run(
            ["g++", "-print-file-name=libasan.so"],
            capture_output=True, text=True, timeout=30,
        ).stdout.strip()
        return out if out and "/" in out else None
    except Exception:  # noqa: BLE001
        return None
