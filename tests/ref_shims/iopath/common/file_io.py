"""iopath.common.file_io shim: PathManager over the local filesystem.

Surface per detectron2/utils/file_io.py: PathManager (class),
PathHandler, HTTPURLHandler, OneDrivePathHandler, file_lock, g_pathmgr.
Remote paths are out of scope for the CPU oracle runs — any non-local
scheme raises.
"""

import errno
import os
import shutil
from contextlib import contextmanager


@contextmanager
def file_lock(path):  # single-process oracle runs: a no-op lock
    yield


class PathHandler:
    _strict_kwargs_check = True

    def _check_kwargs(self, kwargs):
        if self._strict_kwargs_check and kwargs:
            raise ValueError("Unused arguments: {}".format(kwargs))

    def _get_supported_prefixes(self):
        raise NotImplementedError()

    def _get_local_path(self, path, **kwargs):
        raise NotImplementedError()

    def _open(self, path, mode="r", **kwargs):
        raise NotImplementedError()


class _RemoteUnsupported(PathHandler):
    """Registered for URL-ish prefixes; raises only if actually used."""

    def __init__(self, prefixes):
        self._prefixes = prefixes

    def _get_supported_prefixes(self):
        return self._prefixes

    def _get_local_path(self, path, **kwargs):
        raise OSError(
            f"Remote path {path!r} unsupported in the offline oracle shim"
        )

    _open = _get_local_path


class HTTPURLHandler(_RemoteUnsupported):
    def __init__(self):
        super().__init__(["http://", "https://", "ftp://"])


class OneDrivePathHandler(_RemoteUnsupported):
    def __init__(self):
        super().__init__(["https://1drv.ms/u/s!"])


class NativePathHandler(PathHandler):
    def _get_supported_prefixes(self):
        return [""]

    def _get_local_path(self, path, **kwargs):
        return path

    def _open(self, path, mode="r", buffering=-1, **kwargs):
        return open(path, mode, buffering=buffering)


class PathManager:
    def __init__(self):
        self._native = NativePathHandler()
        self._handlers = {}

    def _get_handler(self, path):
        for prefix, h in self._handlers.items():
            if path.startswith(prefix):
                return h
        return self._native

    def register_handler(self, handler, allow_override=True):
        for prefix in handler._get_supported_prefixes():
            self._handlers[prefix] = handler

    def set_strict_kwargs_checking(self, enable):
        pass

    def open(self, path, mode="r", buffering=-1, **kwargs):
        return self._get_handler(path)._open(path, mode, buffering=buffering, **kwargs)

    def get_local_path(self, path, force=False, **kwargs):
        return self._get_handler(path)._get_local_path(path, **kwargs)

    def exists(self, path, **kwargs):
        return os.path.exists(path)

    def isfile(self, path, **kwargs):
        return os.path.isfile(path)

    def isdir(self, path, **kwargs):
        return os.path.isdir(path)

    def ls(self, path, **kwargs):
        return sorted(os.listdir(path))

    def mkdirs(self, path, **kwargs):
        try:
            os.makedirs(path, exist_ok=True)
        except OSError as e:
            if e.errno != errno.EEXIST:
                raise

    def rm(self, path, **kwargs):
        os.remove(path)

    def copy(self, src_path, dst_path, overwrite=False, **kwargs):
        shutil.copyfile(src_path, dst_path)
        return True

    def symlink(self, src_path, dst_path, **kwargs):
        os.symlink(src_path, dst_path)
        return True


g_pathmgr = PathManager()
