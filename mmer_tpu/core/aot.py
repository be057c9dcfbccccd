"""AOT executable cache: compile once per machine, not once per process.

The XLA persistent compilation cache (core/cache.py) keys on the HLO —
which is process-stable for pure-XLA programs but NOT for programs
containing Pallas/Mosaic custom calls (measured: two identical serving
processes wrote different cache hashes for the flash-attention ViViT, so
every restart re-paid a 131–700 s Mosaic compile; README "Where a server
restart's wall-clock goes").  This module sidesteps the HLO key entirely:
it serializes the *compiled executable* via
``jax.experimental.serialize_executable`` under a key WE construct from
the caller's stable name + argument avals + platform/version, and loads
it back in later processes with zero compilation.

Usage::

    step = aot_cached_compile(fn, example_args, key="vivit-serve-b16")
    out = step(*args)          # a jax.stages.Compiled — shapes must match

Degrades gracefully: if the backend's PJRT plugin does not implement
executable (de)serialization, or the cached artifact fails to load
(different jaxlib, different topology), we fall back to a fresh
``jit(fn).lower(args).compile()`` and — when possible — refresh the cache.

No reference counterpart (the reference recompiles nothing — eager
torch); this is TPU-native runtime infrastructure.
"""

from __future__ import annotations

import logging
import os
import pickle
import tempfile

import jax

logger = logging.getLogger(__name__)

_FORMAT_VERSION = 1


def _default_cache_dir() -> str:
    return os.environ.get(
        "MMER_AOT_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mmer_tpu",
                     "aot_cache"))


def _fingerprint(example_args) -> str:
    """Stable hash of the flattened argument avals (shape/dtype) and the
    software/hardware stack. Anything that changes invalidates the entry."""
    import hashlib

    import jaxlib

    leaves, treedef = jax.tree_util.tree_flatten(example_args)
    avals = [(tuple(x.shape), str(x.dtype)) for x in leaves]
    dev = jax.devices()[0]
    stack = (jax.__version__, jaxlib.__version__, dev.platform,
             getattr(dev.client, "platform_version", ""),
             jax.device_count(), _FORMAT_VERSION)
    blob = repr((avals, str(treedef), stack)).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def _marker_path(cache_dir: str | None = None, backend: str | None = None
                 ) -> str:
    backend = backend or jax.default_backend()
    return os.path.join(cache_dir or _default_cache_dir(),
                        f"load_ok.{backend}")


def _mark_load_proven(loaded_path: str) -> None:
    """Record that executable DESERIALIZATION+EXECUTION works on this
    backend (written on every validated cache load).  The marker states a
    platform capability, so it is written to BOTH the default cache dir
    (where ``_auto_mosaic_opt_in`` consults it) and the load's own dir —
    a reader passing either dir to ``aot_load_proven`` sees it."""
    for mdir in {_default_cache_dir(), os.path.dirname(loaded_path)}:
        try:
            os.makedirs(mdir, exist_ok=True)
            with open(_marker_path(mdir), "w") as f:
                f.write(loaded_path + "\n")
        except OSError:
            pass


def aot_load_proven(cache_dir: str | None = None,
                    backend: str | None = None) -> bool:
    """Has a serialized executable ever been loaded AND executed on this
    backend (any process)?  Gates measured-risk opt-ins: betting a Mosaic
    path on the AOT cache is only safe once a load is proven, because a
    failed load falls back to a fresh 131-700 s compile."""
    return os.path.exists(_marker_path(cache_dir, backend))


def aot_artifacts(key_prefix: str, cache_dir: str | None = None) -> list:
    """Cached executables whose call-site key starts with ``key_prefix``."""
    import glob

    return sorted(glob.glob(os.path.join(
        cache_dir or _default_cache_dir(), f"{key_prefix}-*.aotx")))


def aot_cached_compile(fn, example_args: tuple, key: str,
                       cache_dir: str | None = None,
                       want_output: bool = False):
    """Return a ``jax.stages.Compiled`` for ``fn`` at ``example_args``'
    shapes, loading the executable from disk when a matching artifact
    exists and serializing it after a fresh compile otherwise.

    ``key`` names the call site (e.g. ``"vivit-serve"``); the full cache
    key also folds in argument avals + platform, so one name covers every
    shape variant. ``example_args`` must be real arrays: a loaded
    executable is validated by executing it once on them (some backends
    only fail at first run).

    ``want_output=True`` returns ``(compiled, out_or_None)`` where ``out``
    is the cache-load validation run's result on ``example_args`` — the
    caller's first real batch rides the validation execution instead of
    being computed twice (AotJit does this).  ``out`` is None on the
    fresh-compile path, which runs nothing.
    """
    cache_dir = cache_dir or _default_cache_dir()
    path = os.path.join(cache_dir, f"{key}-{_fingerprint(example_args)}.aotx")

    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                (payload, in_tree, out_tree), device_ids = pickle.load(f)
            # Re-bind to the devices the original compile targeted:
            # deserialize_and_load defaults to ALL local devices, which
            # breaks e.g. a single-device program loaded into a process
            # whose backend exposes a mesh.
            by_id = {d.id: d for d in jax.devices()}
            execution_devices = [by_id[i] for i in device_ids]
            compiled = (jax.experimental.serialize_executable
                        .deserialize_and_load(
                            payload, in_tree, out_tree,
                            backend=execution_devices[0].client,
                            execution_devices=execution_devices))
            # Validation execution: some PJRT backends accept the artifact
            # at load but fail at first run (measured on XLA:CPU — the AOT
            # loader rejects same-machine feature strings and execution
            # then dies with NOT_FOUND).  example_args are real arrays, so
            # run once and materialize one element before trusting it.
            out = compiled(*example_args)
            first = jax.tree_util.tree_leaves(out)[0]
            import numpy as _np
            _np.asarray(first.ravel()[:1] if first.ndim else first)
            logger.info("aot: loaded %s (no compile)", os.path.basename(path))
            _mark_load_proven(path)
            return (compiled, out) if want_output else compiled
        except Exception as e:  # stale/foreign artifact → recompile
            logger.warning("aot: failed to load %s (%s); recompiling",
                           os.path.basename(path), e)
            try:
                os.unlink(path)
            except OSError:
                pass

    compiled = jax.jit(fn).lower(*example_args).compile()
    try:
        payload = jax.experimental.serialize_executable.serialize(compiled)
        device_ids = [d.id for d in
                      compiled._executable.xla_executable.local_devices()]
        os.makedirs(cache_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                pickle.dump((payload, device_ids), f)
            os.replace(tmp, path)  # atomic: concurrent processes race safely
            logger.info("aot: saved %s", os.path.basename(path))
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
    except Exception as e:  # plugin without serialize support, etc.
        logger.info("aot: serialization unavailable (%s); compile-only", e)
    return (compiled, None) if want_output else compiled


class AotJit:
    """Drop-in for ``jax.jit(fn)`` that AOT-caches one executable per
    argument-aval signature.

    First call at a new signature compiles (or deserializes) via
    :func:`aot_cached_compile`; later calls dispatch on a host-side
    shape/dtype table.  Restrictions vs ``jax.jit``: positional array
    args only (no kwargs / static args / python-scalar promotion), and
    no sharding annotations — the multi-device extractor paths keep
    plain ``jit`` (their HLO is Mosaic-free, so the standard persistent
    cache already covers them).

    ``enabled=None`` auto-disables on the CPU backend, where XLA:CPU's
    AOT loader rejects same-machine feature strings (measured — see
    ``aot_cached_compile``'s validation step); everything then routes
    through a plain ``jax.jit`` fallback.
    """

    def __init__(self, fn, key: str, enabled: bool | None = None,
                 cache_dir: str | None = None):
        self._fn = fn
        self._key = key
        self._cache_dir = cache_dir
        self._enabled = enabled
        self._jit_fn = None
        self._table: dict = {}

    def _resolve_enabled(self) -> bool:
        if os.environ.get("MMER_AOT_DISABLE"):     # ops kill-switch
            return False
        if self._enabled is None:
            self._enabled = jax.default_backend() != "cpu"
        return self._enabled

    def __call__(self, *args):
        leaves = jax.tree_util.tree_leaves(args)
        sig = tuple((tuple(x.shape), str(getattr(x, "dtype", type(x))))
                    for x in leaves)
        fn = self._table.get(sig)
        if fn is None:
            if self._resolve_enabled():
                fn, out = aot_cached_compile(self._fn, args, self._key,
                                             cache_dir=self._cache_dir,
                                             want_output=True)
                self._table[sig] = fn
                if out is not None:     # validation run WAS this call
                    return out
            else:
                if self._jit_fn is None:
                    self._jit_fn = jax.jit(self._fn)
                fn = self._jit_fn
                self._table[sig] = fn
        return fn(*args)


# Imported for effect at module import time so ``jax.experimental
# .serialize_executable`` resolves as an attribute path above.
import jax.experimental.serialize_executable  # noqa: E402,F401
