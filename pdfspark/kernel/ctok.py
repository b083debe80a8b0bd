"""On-demand compiler/loader for the kernel's optional C fast paths.

Two extensions, each strictly optional with a pure-Python fallback:
- ``_ctok``  — the COS token scanner (cos.py parse_object)
- ``_chash`` — ISO 32000-2 Algorithm 2.B password hash (crypt.hash_2b),
  linked against the system libcrypto (OpenSSL EVP)

Loading returns None (and the kernel stays pure-Python) whenever gcc,
the CPython headers, or the needed libraries are unavailable, the
compile fails, or PDFSPARK_NO_CTOK=1 is set. Notably, `spark-submit
--py-files dist/pdfspark.zip` imports the package from a zip —
extension modules cannot load from a zip, so sources are compiled into
a per-user cache directory keyed by the source hash instead (one gcc
invocation per host, then mmap'd by every executor's Python worker;
tmp-file + atomic rename keeps concurrent workers safe).
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import subprocess
import sysconfig
import tempfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def _read_source(filename: str) -> bytes | None:
    # plain file first; inside a zip the package __loader__ can still
    # hand us the bytes for compilation into the cache dir
    try:
        with open(os.path.join(_PKG_DIR, filename), "rb") as f:
            return f.read()
    except OSError:
        pass
    try:
        import importlib.resources as res

        return (res.files(__package__) / filename).read_bytes()
    except Exception:
        return None


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = os.path.join(base, "pdfspark")
    try:
        os.makedirs(d, exist_ok=True)
        return d
    except OSError:
        return tempfile.gettempdir()


def load_ext(modname: str, filename: str, ldflags: tuple[str, ...] = ()):
    """Compile (if needed) and import one extension; None on failure."""
    if os.environ.get("PDFSPARK_NO_CTOK", "0") == "1":
        return None
    src = _read_source(filename)
    if src is None:
        return None
    tag = hashlib.md5(src + b"\0" + " ".join(ldflags).encode()).hexdigest()[:16]
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    so_path = os.path.join(_cache_dir(), f"{modname}-{tag}{suffix}")
    if not os.path.exists(so_path):
        inc = sysconfig.get_paths()["include"]
        # compile from a tmp copy (the package dir may be a zip) to a
        # unique tmp target, then atomic-rename so concurrent executor
        # workers never see a half-written .so
        fd, tmp_c = tempfile.mkstemp(suffix=".c", dir=_cache_dir())
        with os.fdopen(fd, "wb") as f:
            f.write(src)
        tmp_so = so_path + f".tmp{os.getpid()}"
        try:
            # -ffp-contract=off: the fused interpreter's double math
            # must be IEEE bit-identical to CPython's (no FMA
            # contraction of a*b+c — gcc's default gnu mode contracts)
            r = subprocess.run(
                ["gcc", "-O2", "-fPIC", "-shared", "-ffp-contract=off",
                 f"-I{inc}", tmp_c, "-o", tmp_so, *ldflags],
                capture_output=True,
                timeout=120,
            )
            if r.returncode != 0:
                return None
            os.replace(tmp_so, so_path)
        except Exception:
            return None
        finally:
            for p in (tmp_c, tmp_so):
                try:
                    os.unlink(p)
                except OSError:
                    pass
    try:
        # the spec NAME must equal the module's PyInit_<name> symbol —
        # the extension loader derives it from the name, not the path
        spec = importlib.util.spec_from_file_location(modname, so_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


def load():
    """The COS token scanner (`_ctok`); None on any failure."""
    return load_ext("_ctok", "_ctok.c")


def load_chash():
    """The Algorithm 2.B hash (`_chash`, needs libcrypto)."""
    return load_ext("_chash", "_chash.c", ("-lcrypto",))
