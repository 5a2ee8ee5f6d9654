"""Native (C++) runtime components, built on demand and bound via ctypes.

``blockstore``: parallel pwrite/pread of raw array blocks — the I/O core of
the .wbx dataset container (``io.py``). Built with g++ on first use and
cached next to the source; every consumer has a pure-Python fallback, so a
missing toolchain degrades performance, not functionality.
"""

import ctypes
import logging
import os
import subprocess
import threading

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'blockstore.cpp')
_SO = os.path.join(_HERE, '_blockstore.so')

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
  cmd = ['g++', '-O3', '-shared', '-fPIC', '-pthread', '-std=c++17',
         _SRC, '-o', _SO + '.tmp']
  try:
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    os.replace(_SO + '.tmp', _SO)
    return True
  except (subprocess.SubprocessError, OSError) as e:
    logger.warning('blockstore native build failed (%s); using the '
                   'pure-Python I/O fallback', e)
    return False


def _load():
  global _lib, _build_failed
  with _lock:
    if _lib is not None or _build_failed:
      return _lib
    stale = (not os.path.exists(_SO)
             or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
    if stale and not _build():
      _build_failed = True
      return None
    try:
      lib = ctypes.CDLL(_SO)
    except OSError as e:
      logger.warning('blockstore load failed (%s)', e)
      _build_failed = True
      return None
    c_int64_p = ctypes.POINTER(ctypes.c_int64)
    lib.bs_pwrite_blocks.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_void_p), c_int64_p, c_int64_p,
        ctypes.c_int]
    lib.bs_pwrite_blocks.restype = ctypes.c_int
    lib.bs_pread_blocks.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_void_p), c_int64_p, c_int64_p,
        ctypes.c_int]
    lib.bs_pread_blocks.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
  return _load() is not None


def _as_void_pp(addresses):
  arr = (ctypes.c_void_p * len(addresses))(*addresses)
  return arr


def _as_int64_p(values):
  return (ctypes.c_int64 * len(values))(*values)


def pwrite_blocks(path: str, buffers, offsets, threads: int = 8) -> None:
  """Parallel positional write of numpy buffers (C-contiguous) to path."""
  lib = _load()
  if lib is None:
    raise RuntimeError('native blockstore unavailable')
  addrs = [b.ctypes.data for b in buffers]
  sizes = [b.nbytes for b in buffers]
  err = lib.bs_pwrite_blocks(
      path.encode(), len(buffers), _as_void_pp(addrs),
      _as_int64_p(sizes), _as_int64_p(list(offsets)), threads)
  if err != 0:
    raise OSError(err, os.strerror(err), path)


def pread_blocks(path: str, buffers, offsets, threads: int = 8) -> None:
  """Parallel positional read into preallocated numpy buffers."""
  lib = _load()
  if lib is None:
    raise RuntimeError('native blockstore unavailable')
  addrs = [b.ctypes.data for b in buffers]
  sizes = [b.nbytes for b in buffers]
  err = lib.bs_pread_blocks(
      path.encode(), len(buffers), _as_void_pp(addrs),
      _as_int64_p(sizes), _as_int64_p(list(offsets)), threads)
  if err != 0:
    raise OSError(err, os.strerror(err), path)
