"""The reference's actual surface, Spark-native (SURVEY §2A R1-R9).

Reference pipeline (danilop/SampleBatchProcessing):
- SendJobs.py:16      `os.listdir(localDir)`            -> file listing
- SendJobs.py:26-28   S3 put per file                   -> input prefix
- SendJobs.py:31-34   job message ['process', bucket,
                      inPrefix, outPrefix, fileName]    -> work queue
- GetJobs.py:27-34    parse + dispatch on 'process'
- GetJobs.py:48-53    download + `subprocess.call(
                      [command, in, out])` (default cp)  -> transform
- GetJobs.py:54-60    returncode gate -> upload to
                      outPrefix + fileName + ext        -> commit
- GetJobs.py:37-40    SQS delete-on-success             -> at-least-once

Spark mapping:
- file listing + download  -> `binaryFile` source (one task per file;
  `spark.sql.files.maxPartitionBytes` bounds task size at 100 TB)
- job message              -> manifest DataFrame (same 5 columns)
- dispatch                 -> `filter(action = 'process')` + equi-join
  manifest x file content on file_name
- per-file transform       -> a plugin `bytes -> bytes` callable run
  inside `mapInPandas` (Arrow batches; the generalization of the
  reference's arbitrary `command`, D4)
- upload + delete-on-success -> idempotent per-file write with the
  deterministic output key `out_prefix + file_name + ext`
  (user-data.sh:6); Spark task retry (`spark.task.maxFailures`)
  re-runs failed files and the overwrite makes redelivery harmless —
  the same at-least-once/effectively-once contract as the reference's
  visibility timeout + delete (README.md:44-47).
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

MANIFEST_SCHEMA = ("action string, bucket string, in_prefix string, "
                   "out_prefix string, file_name string")


def build_manifest(spark: SparkSession, bucket_dir: str,
                   in_prefix: str = "input/",
                   out_prefix: str = "output/") -> DataFrame:
    """SendJobs equivalent: list `bucket_dir/in_prefix`, emit one
    'process' job row per file (SendJobs.py:16-34)."""
    from ..session import ship_package
    ship_package(spark)
    # load(dir), not load(dir/*): a literal glob makes Spark's
    # streaming-sink metadata probe log a WARN+stack per query —
    # stderr noise a real failure could hide in.
    listing = (spark.read.format("binaryFile")
               .load(os.path.join(bucket_dir, in_prefix))
               .select(F.regexp_extract("path", r"([^/]+)$", 1)
                       .alias("file_name")))
    return listing.select(
        F.lit("process").alias("action"),
        F.lit(bucket_dir).alias("bucket"),
        F.lit(in_prefix).alias("in_prefix"),
        F.lit(out_prefix).alias("out_prefix"),
        "file_name",
    )


def _command_transform(command: str) -> Callable[[bytes], bytes]:
    """Wrap the reference's external-command contract as a
    ``bytes -> bytes`` transform: stage the input to a task-local
    temp file, run ``[command, in_path, out_path]``
    (GetJobs.py:51-53), gate on returncode == 0 (GetJobs.py:54-56),
    read back the output bytes.  Raising on failure feeds the
    caller's no-commit path — exactly the reference's
    skip-upload-and-redeliver behavior."""
    def _run(raw: bytes) -> bytes:
        import subprocess
        import tempfile
        with tempfile.TemporaryDirectory(prefix="sbp_cmd_") as d:
            in_path = os.path.join(d, "in")
            out_path = os.path.join(d, "out")
            with open(in_path, "wb") as f:
                f.write(raw)
            rc = subprocess.call([command, in_path, out_path])
            if rc != 0:
                raise RuntimeError(f"{command!r} returned {rc}")
            with open(out_path, "rb") as f:
                return f.read()
    return _run


def run_pipeline(spark: SparkSession, manifest: DataFrame,
                 transform: Callable[[bytes], bytes] | None = None,
                 command: str | None = None,
                 ext: str = ".out",
                 commit: str = "replace",
                 store: ObjectStoreClient | None = None) -> DataFrame:
    """GetJobs equivalent: dispatch manifest rows, transform each
    file's bytes, write results under the deterministic output key.

    The transform is either a Python ``bytes -> bytes`` callable or —
    the reference's actual contract — an arbitrary external
    ``command``, executed per file as ``[command, in_path, out_path]``
    with the same returncode gate (GetJobs.py:51-56; the default
    deployment uses ``cp``, user-data.sh:4).  The command runs inside
    the executor's Python worker against task-local temp files, so a
    migrating user brings their shell tool unchanged.  ``transform``
    and ``command`` are mutually exclusive; neither means identity.

    ``commit`` picks the per-file commit strategy:
    - ``"replace"`` (default): write a temp file, ``os.replace`` onto
      the final key — atomic on POSIX filesystems.
    - ``"tempkey"``: write the temp key, COPY to the final key, delete
      the temp key — the strategy for object stores (s3a has no atomic
      rename; copy-to-final-key is what rename compiles to there, and
      a reader never observes a partial final object because the copy
      is a single PUT).  See SCALE.md "Object-store commit".

    Returns a result DataFrame (file_name, in_bytes, out_bytes,
    out_path, ok) — the pipeline's commit log.  Executors write the
    output files directly (the reference's worker-side S3 put,
    GetJobs.py:57-60); rerunning overwrites the same keys.
    """
    if transform is not None and command is not None:
        raise ValueError("pass either transform= or command=, not both")
    if commit not in ("replace", "tempkey"):
        raise ValueError(f"unknown commit strategy {commit!r}")
    if command is not None:
        transform = _command_transform(command)
    transform = transform or (lambda b: b)   # user-data.sh:4: cp = identity

    jobs = manifest.filter(F.col("action") == "process")   # GetJobs.py:30
    # one driver job for the (bucket, prefix) config set — these are
    # deployment constants (a handful), never data-scale
    locations = [(r["bucket"], r["in_prefix"]) for r in
                 jobs.select("bucket", "in_prefix").distinct().collect()]
    files = None
    for b, p in locations:
        part = (spark.read.format("binaryFile")
                .load(os.path.join(b, p))
                .select(
                    F.lit(b).alias("bucket"),
                    F.lit(p).alias("in_prefix"),
                    F.regexp_extract("path", r"([^/]+)$", 1)
                    .alias("file_name"),
                    "content"))
        files = part if files is None else files.unionByName(part)
    if files is None:
        raise ValueError("manifest contains no 'process' jobs")

    joined = jobs.join(files, ["bucket", "in_prefix", "file_name"])
    return (joined
            .select("bucket", "in_prefix", "out_prefix", "file_name",
                    "content")
            .mapInPandas(_file_processor(transform, ext, commit,
                                         store=store),
                         LOG_SCHEMA))


LOG_SCHEMA = ("file_name string, in_bytes long, out_bytes long, "
              "out_path string, ok boolean")


def _split_scheme(uri: str) -> tuple[str, str]:
    """('', path) for bare paths, (scheme, rest) for URIs."""
    if "://" not in uri:
        return "", uri
    scheme, rest = uri.split("://", 1)
    return scheme, rest


class PreconditionFailed(Exception):
    """A conditional PUT lost its race: the object changed (If-Match
    mismatch) or appeared (If-None-Match) between the caller's read
    and its write.  The caller re-reads and retries — this is the
    optimistic-concurrency signal, not an error state."""


class ObjectStoreClient:
    """Worker-side commit contract for object-store schemes — the
    three verbs the reference's S3 flow actually uses (public boto2
    semantics: GetJobs.py:57-60 uploads the result via a single key
    put; delete-on-success GetJobs.py:37-40), plus the one listing
    verb the QUARANTINE maintenance sweep needs (r10, VERDICT r9 #3;
    public S3 ListObjectsV2 semantics — the reference never lists
    because SQS delivers keys, but an operational sweep over the
    bucket has no queue to ask):

    - ``put(key, data)``: store ``data`` under ``key`` as ONE atomic
      object — a reader sees the old object or the new one, never a
      partial (S3 PUT semantics; this is what makes the direct-PUT
      commit safe where POSIX needs write-then-rename).
    - ``get(key)``: the object's bytes, ``FileNotFoundError`` if the
      key does not exist (S3 GET / NoSuchKey; the reference's
      download verb, ``GetJobs.py:31``
      ``get_contents_to_filename``).  Added r12 for the versioned-
      pointer publish (``operators.publish.StorePublisher`` reads
      ``_current.json`` through this).
    - ``copy(src, dst)``: server-side copy — itself a single PUT of
      the destination object.
    - ``delete(key)``: remove the object.
    - ``list(prefix)``: every key under ``prefix`` (flat key
      namespace — no directory notion, exactly S3's ListObjectsV2).

    Implementations must be PICKLABLE: the commit runs inside the
    executor's Python worker, so the client ships through the task
    closure (module state set on the driver does NOT reach workers).
    Three implementations: :class:`LocalObjectStoreClient` (the
    sandbox double, file-backed), :class:`S3ObjectStoreClient` (the
    real bucket over boto3, import-guarded — r13, VERDICT r12 #4),
    and the recording double in tests/test_pipeline.py that asserts
    the exact commit call sequence.
    """

    def put(self, key: str, data: bytes) -> None:
        raise NotImplementedError

    def get(self, key: str) -> bytes:
        raise NotImplementedError

    # -- conditional-write extension (r13, ADVICE r12) --------------
    # S3 shipped conditional writes on the public API (If-None-Match
    # on PutObject 2024-08, If-Match 2024-11), which upgrades the
    # pointer's GET-modify-PUT from last-writer-wins to
    # compare-and-swap.  Two verbs, ETag-based:

    def get_with_etag(self, key: str) -> tuple[bytes, str]:
        """The object's bytes plus its ETag (the version token a
        conditional put compares against); FileNotFoundError if the
        key does not exist."""
        raise NotImplementedError

    def put_if(self, key: str, data: bytes,
               etag: str | None) -> str:
        """Conditional atomic PUT; returns the new object's ETag.

        - ``etag=None``: create-if-absent (If-None-Match: *) — fails
          with :class:`PreconditionFailed` if the key exists.
        - ``etag='...'``: replace-if-match (If-Match) — fails with
          :class:`PreconditionFailed` unless the LIVE object's ETag
          equals ``etag``.

        The success path keeps plain-PUT atomicity: readers see the
        old object or the new one, never a partial."""
        raise NotImplementedError

    def copy(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def delete(self, key: str) -> None:
        raise NotImplementedError

    def list(self, prefix: str) -> list[str]:
        raise NotImplementedError

    def list_pages(self, prefix: str,
                   page_size: int = 1000) -> "Iterator[list[str]]":
        """Paged form of ``list`` (VERDICT r10 #7): real ListObjectsV2
        returns at most 1000 keys per call with a continuation token,
        so any consumer that materializes ``list(prefix)`` whole is
        pricing driver memory by BUCKET size.  Default implementation
        pages over ``list`` (correct for the file-backed double); a
        real S3 client overrides this with the paginator so pages
        stream.  Consumers that only need membership should prefer a
        point lookup — ``list`` with the FULL key as the prefix — as
        :func:`quarantine_sweep` does, bounding memory by the poison
        count instead."""
        keys = self.list(prefix)
        for i in range(0, len(keys), page_size):
            yield keys[i:i + page_size]


class LocalObjectStoreClient(ObjectStoreClient):
    """File-backed reference implementation of the 4-verb contract:
    one file per key under ``root``, PUT visibility made atomic with
    the POSIX temp + ``os.replace`` dance (modeling S3's
    all-or-nothing PUT).  Picklable by construction (state = the
    root string), so it ships through task closures like any real
    client; doubles as the sandbox stand-in for the ``mock://``
    scheme in tests and the p21 registry row."""

    def __init__(self, root: str) -> None:
        self.root = root

    def _p(self, key: str) -> str:
        return os.path.join(self.root, key)

    def put(self, key: str, data: bytes) -> None:
        import uuid
        p = self._p(key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        # unique temp per writer: concurrent puts of the SAME key
        # must each stay atomic (S3 = last-writer-wins, never an
        # interleaved object), so they may not share a temp path
        tmp = f"{p}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)

    def get(self, key: str) -> bytes:
        # FileNotFoundError falls out naturally — the contract's
        # missing-key signal (S3 NoSuchKey)
        with open(self._p(key), "rb") as f:
            return f.read()

    def fs_path(self, key: str) -> str:
        """The POSIX path backing ``key`` — the DOUBLE's data plane.
        Spark cannot read a ``mock://`` URI, so layout parquet I/O in
        tests/registry rows goes straight at the backing file while
        the control plane (pointer, listing, prune) exercises the
        store verbs.  A real deployment has no analog: Spark reads
        ``s3a://bucket/key`` and the client wraps the same bucket."""
        return self._p(key)

    def copy(self, src: str, dst: str) -> None:
        with open(self._p(src), "rb") as f:
            self.put(dst, f.read())

    def delete(self, key: str) -> None:
        # S3 DELETE is idempotent (deleting a missing key succeeds);
        # a re-entrant sweep racing the copy-then-delete window must
        # converge, not crash (ADVICE r10)
        import contextlib
        with contextlib.suppress(FileNotFoundError):
            os.remove(self._p(key))

    # only THIS client's own in-flight temp objects are invisible —
    # a legitimately-named key ending in ".tmp" lists fine (ADVICE
    # r10; the pattern matches put()'s "<key>.<8hex>.tmp")
    _TMP_RE = re.compile(r"\.[0-9a-f]{8}\.tmp$")

    def list(self, prefix: str) -> list[str]:
        # S3 ListObjectsV2 matches by STRING prefix over the flat key
        # namespace — 'b/inp' matches 'b/input/x' (ADVICE r10), so
        # walk the whole root and filter, never treat the prefix as a
        # directory
        out = []
        for dirpath, _dirs, files in os.walk(self.root):
            for name in files:
                if self._TMP_RE.search(name):  # crashed put: invisible
                    continue
                key = os.path.relpath(os.path.join(dirpath, name),
                                      self.root)
                if key.startswith(prefix):
                    out.append(key)
        return sorted(out)

    # -- conditional writes (r13) ------------------------------------
    # ETag = md5 of the content, exactly S3's single-part-PUT ETag.
    # POSIX has no native compare-and-swap on file contents, so
    # writers of the SAME key serialize on an flock'd lock file under
    # the system tempdir (NEVER under any client root — lock files
    # must not appear in listings; r13 placed them in a "<root>.locks"
    # sibling, which a client rooted at the PARENT of a re-rooted
    # client's root could still see in bare string-prefix listings,
    # ADVICE r13 #2); readers never lock (they read the atomically-
    # replaced object as before).

    @staticmethod
    def _etag(data: bytes) -> str:
        import hashlib
        return hashlib.md5(data).hexdigest()

    def _lock_path(self, key: str) -> str:
        # keyed by the BACKING OBJECT's realpath, not (root, key):
        # two clients rooted differently over the same tree (the
        # __main__._store_from_uri re-rooting) — or through a symlink
        # alias of it (macOS /tmp -> /private/tmp) — serialize on the
        # same lock file when they target the same object.  The dir is
        # PER-UID and 0700 (a fixed world-shared /tmp name would hand
        # a second user a PermissionError on every CAS write, and a
        # pre-created hostile dir could squat the path), and the
        # namespace is SHARDED to 4096 slots rather than one file per
        # object: flock is advisory, so hash collisions merely
        # over-serialize two unrelated writers for the lock's
        # microseconds — correctness is unaffected — while the dir
        # stays bounded at 4096 zero-byte files forever (per-object
        # names grew without bound, and lock files can never be
        # safely unlinked: a waiter blocked in flock on the old inode
        # plus a fresh creator on the new one would both hold "the"
        # lock).
        import hashlib
        import tempfile
        d = os.path.join(tempfile.gettempdir(),
                         f"sbp_object_locks_{os.getuid()}")
        os.makedirs(d, mode=0o700, exist_ok=True)
        obj = os.path.realpath(self._p(key))
        shard = int(hashlib.md5(obj.encode()).hexdigest(), 16) % 4096
        return os.path.join(d, f"{shard:04x}")

    def get_with_etag(self, key: str) -> tuple[bytes, str]:
        data = self.get(key)
        return data, self._etag(data)

    def put_if(self, key: str, data: bytes,
               etag: str | None) -> str:
        import fcntl
        with open(self._lock_path(key), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                current: str | None = self._etag(self.get(key))
            except FileNotFoundError:
                current = None
            if etag is None:
                if current is not None:
                    raise PreconditionFailed(
                        f"{key}: exists (etag {current}), "
                        f"create-if-absent refused")
            elif current != etag:
                raise PreconditionFailed(
                    f"{key}: live etag {current} != expected {etag}")
            self.put(key, data)       # atomic replace, under the lock
            return self._etag(data)


def _boto3_client_factory() -> object:
    """Default client factory for :class:`S3ObjectStoreClient` — the
    ONLY place in the repo that imports boto3 (absent from this
    sandbox; VERDICT r12 #4 ships the client behind this guard so a
    real deployment gets it with zero code changes).  Region,
    credentials and endpoint resolve the standard public-SDK way
    (env / config / instance profile); callers needing a custom
    endpoint inject their own factory."""
    try:
        import boto3  # noqa: PLC0415 — the import IS the guard
    except ImportError as e:  # pragma: no cover — sandbox path
        raise ImportError(
            "S3ObjectStoreClient needs boto3 at call time (it is "
            "deliberately not a repo dependency — the sandbox has no "
            "network); pip install boto3 in the deployment image or "
            "inject a client_factory") from e
    return boto3.client("s3")


def _is_missing_key_error(exc: Exception) -> bool:
    """True for the SDK's NoSuchKey/404 shape (botocore ClientError
    carries the code under response['Error']['Code']) without
    importing botocore — the fake client in tests raises the same
    shape."""
    code = (getattr(exc, "response", None) or {}).get(
        "Error", {}).get("Code")
    return code in ("NoSuchKey", "NoSuchBucket", "404")


class S3ObjectStoreClient(ObjectStoreClient):
    """The real-bucket implementation of the 5-verb contract over the
    public boto3 S3 API (VERDICT r12 #4), verb-for-verb:

    - ``put``   = PutObject — S3's PUT is atomic per object, which is
      the exact property the tempkey commit and the versioned-pointer
      publish (``operators.publish.StorePublisher``) are built on.
    - ``get``   = GetObject; NoSuchKey maps to ``FileNotFoundError``,
      the contract's missing-key signal.
    - ``copy``  = CopyObject (server-side; no byte round-trip).
    - ``delete``= DeleteObject — idempotent by S3 semantics, as the
      re-entrant quarantine sweep requires.
    - ``list``  / ``list_pages`` = ListObjectsV2 via the SDK
      paginator, so pages stream at the wire's 1000-key granularity
      and driver memory is bounded by page size, not bucket size.

    PICKLABLE BY CONSTRUCTION: state is (bucket, factory); the live
    SDK client is created lazily per process and dropped from
    ``__getstate__``, because the commit runs inside executor Python
    workers and boto3 clients do not pickle.  Swapping the sandbox
    double for the real bucket is one line at the call site::

        store = LocalObjectStoreClient(root)        # sandbox double
        store = S3ObjectStoreClient("my-bucket")    # real deployment

    and every consumer — ``pipeline_from_manifest(..., store=...)``,
    ``quarantine_sweep(..., store=...)``,
    ``publish.StorePublisher(store, root)`` — takes it unchanged.
    Contract-tested in tests/test_s3_client.py against an in-memory
    boto3-shaped fake (same assertions the file-backed double
    passes); the real-bucket run stays env-gated on boto3 +
    credentials being present."""

    def __init__(self, bucket: str,
                 client_factory: "Callable[[], object]" = None) -> None:
        self.bucket = bucket
        self.client_factory = client_factory or _boto3_client_factory
        self._client = None

    def __getstate__(self) -> dict:
        state = dict(self.__dict__)
        state["_client"] = None   # SDK clients don't pickle
        return state

    def _c(self) -> object:
        if self._client is None:
            self._client = self.client_factory()
        return self._client

    def put(self, key: str, data: bytes) -> None:
        self._c().put_object(Bucket=self.bucket, Key=key, Body=data)

    def get(self, key: str) -> bytes:
        try:
            resp = self._c().get_object(Bucket=self.bucket, Key=key)
        except Exception as e:
            if _is_missing_key_error(e):
                raise FileNotFoundError(key) from e
            raise
        return resp["Body"].read()

    def get_with_etag(self, key: str) -> tuple[bytes, str]:
        try:
            resp = self._c().get_object(Bucket=self.bucket, Key=key)
        except Exception as e:
            if _is_missing_key_error(e):
                raise FileNotFoundError(key) from e
            raise
        return resp["Body"].read(), resp["ETag"].strip('"')

    def put_if(self, key: str, data: bytes,
               etag: str | None) -> str:
        """S3 conditional writes (public API: If-None-Match on
        PutObject since 2024-08, If-Match since 2024-11).  412
        PreconditionFailed = the condition lost; 409
        ConditionalRequestConflict = a concurrent conditional write
        on the same key is in flight — both mean re-read and retry,
        so both map to :class:`PreconditionFailed`.

        Wire form (ADVICE r13 #3): S3's native ETag form is QUOTED
        (`"<md5>"`), and that is what goes on the wire — the
        contract-level token stays the bare hex (get_with_etag
        strips, both implementations agree bit-for-bit), so the
        quotes are re-added here whichever form the caller holds.
        The boto3-shaped fake compares If-Match VERBATIM against the
        quoted form, so a client regression to the bare wire form
        fails the contract tests instead of burning cas_retries
        against real S3."""
        kw = ({"IfNoneMatch": "*"} if etag is None
              else {"IfMatch": (etag if etag.startswith('"')
                                else f'"{etag}"')})
        try:
            resp = self._c().put_object(Bucket=self.bucket, Key=key,
                                        Body=data, **kw)
        except Exception as e:
            code = (getattr(e, "response", None) or {}).get(
                "Error", {}).get("Code")
            if code in ("PreconditionFailed",
                        "ConditionalRequestConflict", "412", "409"):
                raise PreconditionFailed(f"{key}: {code}") from e
            # If-Match on a key that no longer exists is 404 NoSuchKey
            # on real S3 — semantically the precondition LOST (someone
            # deleted the object between read and write), so the
            # caller must re-read, same as a mismatch; the file-backed
            # double already reports this case as PreconditionFailed
            if etag is not None and _is_missing_key_error(e):
                raise PreconditionFailed(
                    f"{key}: deleted since read (was {etag})") from e
            raise
        return resp["ETag"].strip('"')

    def copy(self, src: str, dst: str) -> None:
        self._c().copy_object(
            Bucket=self.bucket, Key=dst,
            CopySource={"Bucket": self.bucket, "Key": src})

    def delete(self, key: str) -> None:
        # DeleteObject succeeds on a missing key — already idempotent
        self._c().delete_object(Bucket=self.bucket, Key=key)

    def list_pages(self, prefix: str,
                   page_size: int = 1000) -> "Iterator[list[str]]":
        paginator = self._c().get_paginator("list_objects_v2")
        for page in paginator.paginate(
                Bucket=self.bucket, Prefix=prefix,
                PaginationConfig={"PageSize": page_size}):
            keys = [o["Key"] for o in page.get("Contents", [])]
            if keys:
                yield keys

    def list(self, prefix: str) -> list[str]:
        return sorted(k for page in self.list_pages(prefix)
                      for k in page)


def _fs_local_path(uri: str) -> str:
    """Scheme shim for the WORKER-side commit: Spark's binaryFile
    reader accepts any Hadoop filesystem URI (`file://`, `s3a://`,
    ...), but the per-file commit runs in the Python worker against
    the filesystem client for that scheme.  Bare paths and
    ``file://`` URIs map to POSIX I/O (what this container can
    execute); object-store schemes dispatch to the caller-supplied
    :class:`ObjectStoreClient` (see ``_file_processor``) and raise
    explicitly here when none is given, rather than writing a local
    directory literally named ``s3a:``."""
    scheme, rest = _split_scheme(uri)
    if scheme == "":
        return uri
    if scheme == "file":
        return "/" + rest.lstrip("/")
    raise NotImplementedError(
        f"scheme {scheme!r}: worker-side commit needs an "
        f"ObjectStoreClient (tempkey commit = single-PUT copy; see "
        f"SCALE.md 'Object-store commit')")


def _file_processor(transform: Callable[[bytes], bytes],
                    ext: str, commit: str,
                    store: ObjectStoreClient | None = None):
    """Arrow-batched per-file worker shared by the batch pipeline and
    the streaming watcher: transform bytes, commit to the
    deterministic key, emit one log row per file.

    Commit dispatch is by BUCKET SCHEME: bare paths and ``file://``
    use POSIX I/O (write temp + ``os.replace`` / copy+delete); any
    other scheme commits through ``store`` (an
    :class:`ObjectStoreClient`, shipped via the task closure):
    - ``tempkey``: put temp key -> server-side copy to the final key
      (a single PUT, so a reader never observes a partial final
      object) -> delete temp — the SCALE.md object-store recipe.
    - ``replace``: one direct put of the final key — on an object
      store the PUT itself is the atomic visibility switch, so the
      POSIX temp/rename dance degenerates to a single call.
    An object-store scheme with no ``store`` raises (never a local
    directory named ``s3a:``)."""
    def _process(batches: Iterator) -> Iterator:
        import posixpath

        import pandas as pd
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                scheme, rest = _split_scheme(r.bucket)
                obj_store = scheme not in ("", "file")
                if obj_store and store is not None:
                    key = posixpath.join(rest, r.out_prefix,
                                         r.file_name + ext)
                    out_path = f"{scheme}://{key}"
                else:
                    out_dir = os.path.join(_fs_local_path(r.bucket),
                                           r.out_prefix)
                    out_path = os.path.join(out_dir, r.file_name + ext)
                raw = bytes(r.content)
                try:
                    result = transform(raw)
                    if obj_store and store is not None:
                        if commit == "replace":
                            store.put(key, result)
                        else:                       # tempkey
                            tmp_key = key + ".inprogress"
                            store.put(tmp_key, result)
                            store.copy(tmp_key, key)
                            store.delete(tmp_key)
                    else:
                        out_dir = os.path.join(
                            _fs_local_path(r.bucket), r.out_prefix)
                        os.makedirs(out_dir, exist_ok=True)
                        tmp = out_path + ".inprogress"
                        with open(tmp, "wb") as f:
                            f.write(result)
                        if commit == "replace":
                            os.replace(tmp, out_path)  # atomic on POSIX
                        else:                       # tempkey: copy+delete
                            import shutil
                            shutil.copyfile(tmp, out_path)
                            os.remove(tmp)
                    ok = True
                except Exception:
                    # returncode gate (GetJobs.py:54-56): no upload,
                    # no delete -> Spark task retry redelivers.
                    result, ok = b"", False
                rows.append((r.file_name, len(raw), len(result),
                             out_path, ok))
            yield pd.DataFrame(rows, columns=[
                "file_name", "in_bytes", "out_bytes", "out_path", "ok"])
    return _process


def watch_prefix(spark: SparkSession, bucket_dir: str,
                 in_prefix: str = "input/",
                 out_prefix: str = "output/",
                 transform: Callable[[bytes], bytes] | None = None,
                 command: str | None = None,
                 ext: str = ".out",
                 commit: str = "replace",
                 checkpoint: str | None = None,
                 store: ObjectStoreClient | None = None) -> DataFrame:
    """The reference's LONG-POLL CONSUMER (GetJobs.py:21-23), made
    rigorous: watch ``bucket_dir/in_prefix`` as a binaryFile
    micro-batch stream; every newly discovered file is one job
    (new-file discovery == SQS message arrival, R3/R4), processed by
    the same transform/commit worker as :func:`run_pipeline`.

    Exactly the reference's delivery contract, strengthened:
    - streaming CHECKPOINT == delete-on-success (GetJobs.py:37-40) —
      a processed file is never redelivered across restarts;
    - task retry + idempotent deterministic output key == visibility
      timeout redelivery (README.md:44-47);
    - ``Trigger.AvailableNow`` == one drain-the-queue run — the call
      returns when the backlog is empty instead of looping forever.

    The per-file commit LOG is appended to
    ``bucket_dir/_commit_log`` (parquet) by each micro-batch — an
    executor-written sink, no driver accumulation.  Each row is
    tagged with a per-run sequence number and the micro-batch id; the
    RETURNED DataFrame is the cumulative log deduped to the NEWEST
    row per file (a file that failed under an old checkpoint and
    succeeded after a fresh one must not surface both its ok=false
    and ok=true rows).  The on-disk log keeps full history.
    """
    q = _start_watch_stream(spark, bucket_dir, in_prefix, out_prefix,
                            transform, command, ext, commit, checkpoint,
                            trigger={"availableNow": True}, store=store)
    q.awaitTermination()
    return commit_log(spark, bucket_dir)


def watch_daemon(spark: SparkSession, bucket_dir: str,
                 in_prefix: str = "input/",
                 out_prefix: str = "output/",
                 transform: Callable[[bytes], bytes] | None = None,
                 command: str | None = None,
                 ext: str = ".out",
                 commit: str = "replace",
                 checkpoint: str | None = None,
                 poll_seconds: float = 5.0,
                 store: ObjectStoreClient | None = None):
    """The reference's INFINITE long-poll loop (GetJobs.py:21-23
    ``while (True): get_messages(wait_time_seconds=20)``), as a
    continuously-running micro-batch stream: new files under
    ``bucket_dir/in_prefix`` are discovered every ``poll_seconds``
    (the long-poll wait, shortened from the reference's 20 s for
    tests) and processed by the same transform/commit worker as
    :func:`run_pipeline`.

    Unlike :func:`watch_prefix` (``Trigger.AvailableNow`` = one
    drain-the-backlog run) this RETURNS the running StreamingQuery and
    never drains to completion — the caller owns the loop's lifetime
    and stops it with ``query.stop()``, which is exactly where the
    CLI wires the reference's SIGINT graceful-shutdown handler
    (GetJobs.py:63-65,80; see ``__main__.cmd_watch``).  Checkpoint +
    idempotent per-file commit give the same delivery contract as
    watch_prefix: no redelivery across restarts, failed files retried
    by the next discovery of a fresh copy."""
    return _start_watch_stream(
        spark, bucket_dir, in_prefix, out_prefix, transform, command,
        ext, commit, checkpoint,
        trigger={"processingTime": f"{poll_seconds} seconds"},
        store=store)


def _start_watch_stream(spark: SparkSession, bucket_dir: str,
                        in_prefix: str, out_prefix: str,
                        transform: Callable[[bytes], bytes] | None,
                        command: str | None, ext: str, commit: str,
                        checkpoint: str | None, trigger: dict,
                        store: ObjectStoreClient | None = None):
    """Shared stream starter for watch_prefix (AvailableNow drain) and
    watch_daemon (ProcessingTime long-poll loop)."""
    from ..session import ship_package
    ship_package(spark)
    if transform is not None and command is not None:
        raise ValueError("pass either transform= or command=, not both")
    if command is not None:
        transform = _command_transform(command)
    transform = transform or (lambda b: b)

    in_dir = os.path.join(bucket_dir, in_prefix)
    log_dir = os.path.join(bucket_dir, "_commit_log")
    checkpoint = checkpoint or os.path.join(bucket_dir, "_checkpoint")
    # file streams need an explicit schema; binaryFile's is fixed
    schema = ("path string, modificationTime timestamp, "
              "length long, content binary")
    sdf = (spark.readStream.format("binaryFile").schema(schema)
           .load(in_dir))
    proc = _file_processor(transform, ext, commit, store=store)

    import time
    # Monotone across runs (unlike the checkpointed batch id, which
    # RESETS when the user starts a fresh checkpoint) — gives the
    # history-wide dedupe a global "newest wins" order.
    run_seq = float(time.time())

    def _each_batch(batch_df: DataFrame, bid: int) -> None:
        log = (batch_df.select(
            F.lit(bucket_dir).alias("bucket"),
            F.lit(in_prefix).alias("in_prefix"),
            F.lit(out_prefix).alias("out_prefix"),
            F.regexp_extract("path", r"([^/]+)$", 1).alias("file_name"),
            "content")
            .mapInPandas(proc, LOG_SCHEMA)
            .withColumn("run_seq", F.lit(run_seq))
            .withColumn("batch_id", F.lit(bid)))
        log.write.mode("append").parquet(log_dir)

    return (sdf.writeStream.foreachBatch(_each_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(**trigger).start())


def commit_log(spark: SparkSession, bucket_dir: str,
               log_dir: str | None = None) -> DataFrame:
    """Cumulative per-file commit log for a watched bucket, deduped to
    the NEWEST row per file (a file that failed under an old
    checkpoint and succeeded after a fresh one must not surface both
    its ok=false and ok=true rows).  The on-disk log keeps history.
    ``log_dir`` overrides the default location (same seam as
    :func:`quarantine_ledger`: an object-store bucket keeps its
    Spark-written control tables on a Spark-readable filesystem)."""
    log_dir = log_dir or os.path.join(bucket_dir, "_commit_log")
    if not os.path.exists(log_dir):     # nothing ever processed
        return spark.createDataFrame([], LOG_SCHEMA)
    full = spark.read.parquet(log_dir)
    if "run_seq" not in full.columns:   # pre-tagging log on disk
        return full
    w = (W.partitionBy("file_name")
         .orderBy(F.col("run_seq").desc(), F.col("batch_id").desc(),
                  F.col("ok").desc()))
    return (full.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "run_seq", "batch_id"))


LEDGER_SCHEMA = ("file_name string, n_failures long, "
                 "quarantined_path string")


def quarantine_ledger(spark: SparkSession, bucket_dir: str,
                      ledger_dir: str | None = None) -> DataFrame:
    """Cumulative poison-file ledger for a watched bucket (one row per
    quarantined input file; see :func:`quarantine_sweep`).
    ``ledger_dir`` overrides the default ``bucket_dir/
    _quarantine_ledger`` location — the seam an object-store bucket
    uses to keep its Spark-written control tables on a
    Spark-readable filesystem (in production s3a IS one; the sandbox
    has no Hadoop object-store connector, so tests pass a local
    path)."""
    ledger_dir = ledger_dir or os.path.join(bucket_dir,
                                            "_quarantine_ledger")
    if not os.path.exists(ledger_dir):
        return spark.createDataFrame([], LEDGER_SCHEMA)
    return spark.read.parquet(ledger_dir)


def quarantine_sweep(spark: SparkSession, bucket_dir: str,
                     in_prefix: str = "input/",
                     quarantine_prefix: str = "quarantine/",
                     max_attempts: int = 3,
                     store: ObjectStoreClient | None = None,
                     log_dir: str | None = None,
                     ledger_dir: str | None = None) -> DataFrame:
    """POISON-MESSAGE QUARANTINE (r9, VERDICT r8 #5) — the one
    delivery semantics the reference itself lacks: GetJobs.py:54-56
    skips the SQS delete on a nonzero returncode, so the visibility
    timeout redelivers a permanently-failing job FOREVER
    (README.md:44-47 documents the loop; there is no dead-letter
    queue).  The repo's watch path faithfully preserves
    retry-via-redelivery; this sweep is the operational escape hatch.

    Policy: a file whose NEWEST commit-log row is a failure and which
    has accumulated >= ``max_attempts`` failure rows (each redelivery
    appends one — the attempt counter IS the commit-log history) is
    moved out of ``in_prefix`` into ``quarantine_prefix``, so no
    future drain or fresh-checkpoint redelivery can pick it up, and
    recorded in the append-only ``_quarantine_ledger`` parquet next
    to the commit log.  A file that eventually SUCCEEDED is never
    touched (newest row ok=true), however many failures preceded it.

    The candidate set is computed as one Spark aggregation over the
    log; only the resulting POISON LIST (bounded by the number of
    forever-failing files — operational metadata, not data) is
    collected for the driver-side moves.  Moves dispatch on the
    bucket SCHEME (r10, VERDICT r9 #3): local and ``file://``
    buckets move via ``os.replace``; any other scheme moves through
    the caller-supplied :class:`ObjectStoreClient` (``list`` for
    existence, ``copy`` + ``delete`` for the move — copy FIRST, so a
    crash between the two leaves the object visible in both places
    and the re-run's re-copy/delete converges).  An object-store
    bucket with no ``store`` raises.  ``log_dir``/``ledger_dir``
    override the Spark-written control-table locations — on a real
    deployment they stay in the bucket (s3a is a Hadoop filesystem);
    the sandbox's ``mock://`` tests keep them on local disk.

    Crash-safe (r10, ADVICE): the ledger append runs AFTER the
    moves, so every sweep first RECONCILES — a candidate whose input
    is gone but which sits under ``quarantine_prefix`` without a
    ledger row (a previous sweep died between move and append) gets
    its row backfilled from the commit-log stats.

    A legacy pre-tagging log (no run_seq/batch_id columns — the same
    on-disk shape :func:`commit_log` guards for) falls back to
    "newest" = EVER SUCCEEDED: with no ordering columns the sweep
    cannot know which row is last, so only files with zero ok rows
    qualify — strictly conservative (never quarantines a file a
    tagged log would keep).

    Returns the cumulative ledger (LEDGER_SCHEMA).  Idempotent: a
    swept-and-ledgered file's input object is gone and its ledger row
    exists, so a second sweep moves nothing and appends nothing."""
    if max_attempts < 1:
        raise ValueError(f"max_attempts must be >= 1, got {max_attempts}")
    scheme, rest = _split_scheme(bucket_dir)
    obj_store = scheme not in ("", "file")
    if obj_store and store is None:
        raise ValueError(
            f"bucket scheme {scheme!r} needs an ObjectStoreClient "
            f"(put/copy/delete/list) to sweep — pass store=")
    log_dir = log_dir or os.path.join(bucket_dir, "_commit_log")
    ledger_dir = ledger_dir or os.path.join(bucket_dir,
                                            "_quarantine_ledger")
    if not os.path.exists(log_dir):
        return quarantine_ledger(spark, bucket_dir, ledger_dir)
    full = spark.read.parquet(log_dir)
    if "run_seq" in full.columns:
        newest_ok = F.max(F.struct("run_seq", "batch_id", "ok"))["ok"]
    else:                               # legacy pre-tagging log
        newest_ok = F.max(F.col("ok"))  # ever succeeded -> keep
    stats = (full.groupBy("file_name")
             .agg(F.sum(F.when(~F.col("ok"), 1).otherwise(0))
                  .alias("n_failures"), newest_ok.alias("_ok"))
             .filter((F.col("n_failures") >= max_attempts)
                     & ~F.col("_ok"))
             .select("file_name", "n_failures"))
    # poison list only — bounded by the forever-failing file count
    candidates = stats.collect()

    import posixpath
    if obj_store:
        in_key = posixpath.join(rest, in_prefix)
        q_key = posixpath.join(rest, quarantine_prefix)
        # POINT lookups, one per poison candidate (list with the FULL
        # key as prefix — ListObjectsV2 semantics make that an
        # existence check), NOT two whole-prefix listings: driver
        # memory is priced by the poison count, never the bucket size
        # (VERDICT r10 #7)
        def _exists(key):
            return key in store.list(key)

        def _has_input(name):
            return _exists(posixpath.join(in_key, name))

        def _in_quarantine(name):
            return _exists(posixpath.join(q_key, name))

        def _move(name):
            src = posixpath.join(in_key, name)
            dst = posixpath.join(q_key, name)
            store.copy(src, dst)        # copy-then-delete: re-runnable
            store.delete(src)
            return f"{scheme}://{dst}"
    else:
        in_dir = _fs_local_path(os.path.join(bucket_dir, in_prefix))
        q_dir = _fs_local_path(os.path.join(bucket_dir,
                                            quarantine_prefix))

        def _has_input(name):
            return os.path.exists(os.path.join(in_dir, name))

        def _in_quarantine(name):
            return os.path.exists(os.path.join(q_dir, name))

        def _move(name):
            dst = os.path.join(q_dir, name)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(os.path.join(in_dir, name), dst)
            return dst

    # ledger names: bounded by the poison count (same order as the
    # candidate list — operational metadata)
    ledgered = {r["file_name"] for r in
                quarantine_ledger(spark, bucket_dir, ledger_dir)
                .select("file_name").collect()}
    new_rows = []
    for r in sorted(candidates, key=lambda r: r["file_name"]):
        name, n_fail = r["file_name"], r["n_failures"]
        if _has_input(name):            # not yet swept: move it
            new_rows.append((name, n_fail, _move(name)))
        elif _in_quarantine(name) and name not in ledgered:
            # reconcile: moved by a sweep that died pre-append
            dst = (f"{scheme}://{posixpath.join(q_key, name)}"
                   if obj_store else os.path.join(q_dir, name))
            new_rows.append((name, n_fail, dst))
    if new_rows:
        # local_df (r15, guide §4): the pickled-RDD scan of a
        # createDataFrame(list) re-enters through a Python worker in
        # every consuming stage; rows are (str, int, str) non-null by
        # construction, so the Arrow LocalTableScan path is
        # value-identical (the last pickled-RDD site on a pipeline
        # path — VERDICT r14 #4)
        from ..exprs import local_df
        (local_df(spark, new_rows, LEDGER_SCHEMA)
         .coalesce(1).write.mode("append").parquet(ledger_dir))
    return quarantine_ledger(spark, bucket_dir, ledger_dir)
