"""Portable AOT warm start: serialized PJRT executables on disk.

The reference's warm start deserializes a ``.trt`` engine in seconds
(/root/reference/src/tensorrt/img2img_load.cpp:157-172). JAX's persistent
compilation cache is the nominal equivalent, but on the axon remote
backend the server-side compile is not reliably captured across
processes (BENCH_NOTES round-4 warm-start table: 199/315/53/323 s
pipeline-ready on identical code). This module is the client-side
``.trt`` equivalent: ``jax.experimental.serialize_executable`` writes the
compiled executable bytes next to the engine cache; the next process
``deserialize_and_load``s them and skips trace+lower+compile entirely.

Usage: ``configure(models_dir)`` (Upscaler does this in build()/load()),
then construct programs via ``cached_jit(fn, tag=...)`` instead of
``jax.jit(fn)``. The returned object is call-compatible with a jitted
function for array-pytree arguments and falls back to the plain jitted
path whenever serialization is unsupported or a stored blob fails to
load.

Cache-key correctness: a stored executable is only valid for the exact
program it was compiled from. The key therefore covers
  - a content hash of every ``.py`` source in this package (any code
    change invalidates every entry),
  - the jax version and the device fingerprint (platform + device_kind +
    device count — executables are device-specific),
  - the caller's ``tag`` (must capture everything that shapes the traced
    graph beyond the arguments: module hyperparameters via
    ``module_tag``, RenderConfig, plan geometry inputs),
  - the argument pytree structure and every leaf's shape/dtype,
  - the jit options (compiler_options etc.).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading
from pathlib import Path
from typing import Any, Optional

import jax

_lock = threading.Lock()
_dir: Optional[Path] = None
_device = None
_code_fp: Optional[str] = None
_warned: set = set()

EXE_SUFFIX = ".pjrt"


def configure(models_dir: Optional[str | Path], device=None) -> None:
    """Point the store at ``<models_dir>/.jax_cache/executables`` (None
    disables). Mirrors the reference's engines-next-to-the-model layout.

    ``device``: the single execution device programs run on (the
    Upscaler's selected device). Serialized executables are loaded onto
    exactly this device — deserialize_and_load's default is the client's
    FULL device list, which mis-loads a 1-device program as N-sharded on
    multi-device backends (the 8-device CPU test mesh).

    Any source edit invalidates every entry (the key covers the package
    hash), so stale blobs from previous code versions can never be read
    again; configure prunes them (filenames carry the code fingerprint
    as a prefix — one bench day accumulated 642 MB of dead blobs
    otherwise)."""
    global _dir, _device
    _device = device
    if models_dir is None:
        _dir = None
        return
    _dir = Path(models_dir) / ".jax_cache" / "executables"
    try:
        if _dir.is_dir():
            live = _code_fingerprint()
            for p in _dir.glob(f"*{EXE_SUFFIX}"):
                pre = p.name.split("-", 1)[0]
                if pre != live:
                    p.unlink(missing_ok=True)
    except OSError:
        pass


def _exec_device():
    if _device is not None:
        return _device
    return jax.devices()[0]


def store_dir() -> Optional[Path]:
    return _dir


def enabled() -> bool:
    """On by default on TPU serving paths; WAIFU2X_EXE_CACHE=1/0 forces.

    CPU/GPU default off: those backends compile locally in seconds and the
    JAX persistent cache already covers them; the axon remote-TPU compile
    is the 200+ s path this store exists for."""
    env = os.environ.get("WAIFU2X_EXE_CACHE")
    if env is not None:
        return env not in ("0", "false", "")
    if _dir is None:
        return False
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def _code_fingerprint() -> str:
    """Content hash of the package sources — any edit invalidates the
    store (the stored bytes encode the traced graph, which the sources
    define)."""
    global _code_fp
    if _code_fp is None:
        pkg = Path(__file__).resolve().parent.parent
        h = hashlib.sha256()
        for p in sorted(pkg.rglob("*.py")):
            h.update(str(p.relative_to(pkg)).encode())
            h.update(p.read_bytes())
        _code_fp = h.hexdigest()[:16]
    return _code_fp


def _device_fingerprint() -> str:
    dev = _exec_device()
    return (f"{jax.default_backend()}|d{getattr(dev, 'id', 0)}|"
            f"{getattr(dev, 'device_kind', '?')}")


def module_tag(module: Any) -> str:
    """Identity string for a flax module: the dataclass repr covers every
    hyperparameter (dims, depths, kernel flags, dtype, fast-softmax
    choice), which together with the package source hash pins the traced
    graph."""
    return hashlib.sha256(repr(module).encode()).hexdigest()[:16]


def _warn_once(logger, key: str, msg: str) -> None:
    if key in _warned:
        return
    _warned.add(key)
    if logger is not None:
        logger(msg)
    else:
        import logging

        logging.getLogger("waifu2x_tpu").warning(msg)


class CachedProgram:
    """Call-compatible replacement for ``jax.jit(fn)`` that persists
    compiled executables.

    First call per argument geometry: load ``<key>.pjrt`` from the store
    (deserialize_and_load — seconds) or AOT-compile
    (``jit.lower().compile()``) and serialize the result. Subsequent
    calls hit the in-memory executable directly. ``lower`` is passed
    through to the underlying jitted function (cost analysis etc.)."""

    def __init__(self, fn, tag: str, jit_kw: dict, logger=None) -> None:
        self._jit = jax.jit(fn, **jit_kw)
        self._tag = tag
        self._jit_kw_repr = repr(sorted(jit_kw.items(), key=lambda kv: kv[0]))
        self._mem: dict[str, Any] = {}
        self._logger = logger

    # -- jit-API passthroughs -------------------------------------------
    def lower(self, *args, **kw):
        return self._jit.lower(*args, **kw)

    @property
    def jitted(self):
        return self._jit

    # -- keying ----------------------------------------------------------
    def _key(self, args) -> str:
        leaves, treedef = jax.tree_util.tree_flatten(args)
        shapes = ";".join(
            f"{tuple(getattr(l, 'shape', ()))}/{getattr(l, 'dtype', type(l).__name__)}"
            for l in leaves
        )
        s = "|".join([
            _code_fingerprint(),
            jax.__version__,
            _device_fingerprint(),
            self._tag,
            self._jit_kw_repr,
            str(treedef),
            shapes,
        ])
        return hashlib.sha256(s.encode()).hexdigest()[:24]

    # -- store IO --------------------------------------------------------
    def _path(self, key: str) -> Optional[Path]:
        if _dir is None:
            return None
        # fingerprint-prefixed so configure() can prune dead generations
        return _dir / f"{_code_fingerprint()}-{key}{EXE_SUFFIX}"

    def _load(self, key: str):
        path = self._path(key)
        if path is None or not path.is_file():
            return None
        try:
            from jax.experimental import serialize_executable as se

            with open(path, "rb") as f:
                rec = pickle.load(f)
            return se.deserialize_and_load(
                rec["payload"], rec["in_tree"], rec["out_tree"],
                execution_devices=[_exec_device()])
        except Exception as e:  # corrupt blob / backend refuses: recompile
            _warn_once(
                self._logger, f"load:{key}",
                f"executable cache entry {path.name} unusable "
                f"({type(e).__name__}: {e}); recompiling")
            return None

    def _save(self, key: str, compiled) -> None:
        path = self._path(key)
        if path is None:
            return
        try:
            from jax.experimental import serialize_executable as se

            payload, in_tree, out_tree = se.serialize(compiled)
            rec = {
                "payload": payload,
                "in_tree": in_tree,
                "out_tree": out_tree,
                "jax": jax.__version__,
                "tag": self._tag,
            }
            path.parent.mkdir(parents=True, exist_ok=True)
            tmp = path.with_suffix(f".tmp{os.getpid()}")
            with open(tmp, "wb") as f:
                pickle.dump(rec, f)
            os.replace(tmp, path)
        except Exception as e:  # serialization unsupported on this backend
            _warn_once(
                self._logger, "save",
                f"executable serialization unavailable "
                f"({type(e).__name__}: {e}); warm start will rely on the "
                f"persistent compilation cache")

    def _get(self, key: str, args):
        exe = self._mem.get(key)
        if exe is None:
            with _lock:
                exe = self._mem.get(key)
                if exe is None:
                    exe = self._load(key)
                    if exe is None:
                        exe = self._jit.lower(*args).compile()
                        self._save(key, exe)
                    self._mem[key] = exe
        return exe

    # -- AOT -------------------------------------------------------------
    def aot(self, *args):
        """Load-or-compile the executable for this argument geometry
        (arguments may be ShapeDtypeStructs). build() uses this to write
        the store the way the reference's build writes the .trt."""
        if not enabled():
            return self._jit.lower(*args).compile()
        return self._get(self._key(args), args)

    # -- call ------------------------------------------------------------
    def __call__(self, *args):
        if not enabled():
            return self._jit(*args)
        key = self._key(args)
        exe = self._get(key, args)
        try:
            return exe(*args)
        except Exception as e:
            # A deserialized executable can be stricter than jit (committed
            # devices, layouts). Never fail a render over the cache: drop
            # to the jitted path for this geometry.
            _warn_once(
                self._logger, f"call:{key}",
                f"cached executable rejected arguments "
                f"({type(e).__name__}: {e}); using jit path")
            self._mem[key] = self._jit
            return self._jit(*args)


def cached_jit(fn, tag: str, logger=None, **jit_kw):
    """``jax.jit`` drop-in: returns a CachedProgram when the store is
    configured, else the plain jitted function."""
    if _dir is None:
        return jax.jit(fn, **jit_kw)
    return CachedProgram(fn, tag, jit_kw, logger=logger)
