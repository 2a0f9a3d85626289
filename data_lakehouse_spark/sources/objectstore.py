"""S12: object-store put/list/stat — the pre-engine landing tier.

The reference lands raw files on MinIO and discovers them by prefix
before any Spark job runs (dags/01_download_kaggle_dataset.py:197-234
fput_object + stat_object verify; dags/02_bronze_ingestion_to_iceberg
.py:25-39 list_objects(prefix, recursive) → sorted s3a paths fed to
``spark.read``). This module is the engine-side equivalent of that
client contract over any mounted filesystem (local disk here; an
NFS/FUSE-mounted bucket in production — the call sites don't change,
and on a real S3 endpoint the same five calls map 1:1 onto the SDK):

- atomic visibility: an object never appears half-written —
  ``put``/``fput`` write a temp file and ``os.replace`` it in, the
  same all-or-nothing contract S3 PUT gives (a concurrently listing
  ingestion job sees whole objects or nothing);
- content etags: md5 recorded at write, verified on ``stat`` demand —
  the upload-verification step the reference performs;
- prefix listing returns keys in sorted order (S3 semantics), which
  is what makes the reference's file ordering deterministic.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import shutil
import time

__all__ = ["ObjectInfo", "ObjectStore"]


@dataclasses.dataclass(frozen=True)
class ObjectInfo:
    bucket: str
    object_name: str
    size: int
    etag: str
    last_modified: float


class ObjectStore:
    """Minimal S3-shaped object client over a filesystem root."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- buckets -----------------------------------------------------------
    def _bucket_path(self, bucket: str) -> str:
        if not bucket or "/" in bucket:
            raise ValueError(f"invalid bucket name {bucket!r}")
        return os.path.join(self.root, bucket)

    def make_bucket(self, bucket: str) -> None:
        os.makedirs(self._bucket_path(bucket), exist_ok=True)

    def bucket_exists(self, bucket: str) -> bool:
        return os.path.isdir(self._bucket_path(bucket))

    # -- objects -----------------------------------------------------------
    def _object_path(self, bucket: str, object_name: str) -> str:
        name = object_name.lstrip("/")
        if ".." in name.split("/"):
            raise ValueError(f"invalid object name {object_name!r}")
        return os.path.join(self._bucket_path(bucket), name)

    def path(self, bucket: str, object_name: str) -> str:
        """Filesystem path for ``spark.read`` — the ``s3a://`` analog
        the reference builds for every discovered object."""
        return self._object_path(bucket, object_name)

    def put_object(self, bucket: str, object_name: str, data: bytes) -> ObjectInfo:
        """Atomic PUT: readers never observe a partial object."""
        dest = self._object_path(bucket, object_name)
        if not self.bucket_exists(bucket):
            raise FileNotFoundError(f"bucket {bucket!r} does not exist")
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        tmp = f"{dest}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        etag = hashlib.md5(data).hexdigest()
        with open(tmp + ".etag", "w") as f:
            f.write(etag)
        os.replace(tmp + ".etag", dest + ".etag")
        os.replace(tmp, dest)
        return self.stat_object(bucket, object_name)

    def fput_object(
        self, bucket: str, object_name: str, file_path: str
    ) -> ObjectInfo:
        """Upload a local file (reference: client.fput_object,
        dags/01:208-212) — streamed copy, atomic rename."""
        dest = self._object_path(bucket, object_name)
        if not self.bucket_exists(bucket):
            raise FileNotFoundError(f"bucket {bucket!r} does not exist")
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        tmp = f"{dest}.tmp.{os.getpid()}"
        md5 = hashlib.md5()
        with open(file_path, "rb") as src, open(tmp, "wb") as out:
            while chunk := src.read(1 << 20):
                md5.update(chunk)
                out.write(chunk)
        with open(tmp + ".etag", "w") as f:
            f.write(md5.hexdigest())
        os.replace(tmp + ".etag", dest + ".etag")
        os.replace(tmp, dest)
        return self.stat_object(bucket, object_name)

    def stat_object(self, bucket: str, object_name: str) -> ObjectInfo:
        """Size + etag + mtime (reference verifies every upload with
        stat_object, dags/01:214-216)."""
        p = self._object_path(bucket, object_name)
        if not os.path.isfile(p):
            raise FileNotFoundError(
                f"object {object_name!r} not found in bucket {bucket!r}"
            )
        try:
            with open(p + ".etag") as f:
                etag = f.read().strip()
        except FileNotFoundError:
            with open(p, "rb") as f:
                etag = hashlib.md5(f.read()).hexdigest()
        st = os.stat(p)
        return ObjectInfo(bucket, object_name, st.st_size, etag, st.st_mtime)

    def list_objects(
        self, bucket: str, prefix: str = "", recursive: bool = True
    ) -> list[ObjectInfo]:
        """Sorted prefix listing (S3 lexicographic-key semantics —
        what makes the reference's file ordering deterministic,
        dags/02:25-37)."""
        bp = self._bucket_path(bucket)
        if not os.path.isdir(bp):
            raise FileNotFoundError(f"bucket {bucket!r} does not exist")
        out = []
        for dp, dirs, fs in os.walk(bp):
            if not recursive and os.path.abspath(dp) != os.path.abspath(bp):
                continue
            for fname in fs:
                if fname.endswith((".etag",)) or ".tmp." in fname:
                    continue
                full = os.path.join(dp, fname)
                key = os.path.relpath(full, bp).replace(os.sep, "/")
                if not key.startswith(prefix):
                    continue
                out.append(self.stat_object(bucket, key))
        return sorted(out, key=lambda o: o.object_name)

    def get_object(self, bucket: str, object_name: str) -> bytes:
        with open(self._object_path(bucket, object_name), "rb") as f:
            return f.read()

    def remove_object(self, bucket: str, object_name: str) -> None:
        p = self._object_path(bucket, object_name)
        os.remove(p)
        with __import__("contextlib").suppress(FileNotFoundError):
            os.remove(p + ".etag")

    # -- landing workflow --------------------------------------------------
    def land_files(
        self,
        bucket: str,
        files: list[str],
        *,
        prefix: str,
        date_partition: bool = True,
    ) -> list[dict]:
        """The reference's landing loop (dags/01:197-234): upload each
        file under ``prefix[/YYYY-MM-DD]/name``, verify by stat, return
        the manifest the ingestion DAG passes downstream."""
        self.make_bucket(bucket)
        stamp = time.strftime("%Y-%m-%d", time.gmtime())
        landed = []
        for fp in files:
            name = os.path.basename(fp)
            key = (
                f"{prefix}/{stamp}/{name}" if date_partition else f"{prefix}/{name}"
            )
            info = self.fput_object(bucket, key, fp)
            landed.append(
                {
                    "file_name": name,
                    "object_name": key,
                    "path": self.path(bucket, key),
                    "size": info.size,
                    "etag": info.etag,
                }
            )
        return landed

    def discover(
        self, bucket: str, prefix: str, *, suffix: str = ".csv"
    ) -> list[str]:
        """Discovery step (dags/02:25-39): sorted paths of every object
        under the prefix with the suffix — ready for ``spark.read``."""
        return [
            self.path(bucket, o.object_name)
            for o in self.list_objects(bucket, prefix)
            if o.object_name.endswith(suffix)
        ]
