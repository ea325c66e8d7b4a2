"""Sharded checkpointing with autoresume (orbax).

TPU-native equivalent of Composer checkpointing as the reference configures it
(reference: yamls/hydra-yamls/SD-2-base-512.yaml:97-100 `save_folder`,
`save_interval: 10000ba`, `save_overwrite`, `autoresume`; load via
`load_path`/`load_weights_only`, scripts/fid-clip-evaluation.py:103-105).

Layout: <save_folder>/ba<batch>/state  (orbax sharded pytree: params,
opt_state, ema, step) + meta.json (timestamp, algorithm/callback state, rng
seed). Checkpoints restore with the *current* mesh's shardings — resharding
across topologies is free (orbax reads each shard where it will live).
Autoresume = pick the highest complete ba<N> in the folder (reference:
Composer autoresume discovers the latest checkpoint the same way).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint_path",
           "checkpoint_batch", "finalize_pending", "prune_checkpoints",
           "sync_from_remote", "drain_remote_uploads",
           "fetch_checkpoint_dir"]

_BA_RE = re.compile(r"^ba(\d+)$")
_COMPLETE = "meta.json"  # written last => marks a complete checkpoint

# One long-lived checkpointer so async saves have an owner to wait on (and
# so repeated saves reuse orbax's worker thread instead of respawning it).
_CKPTR = None
# (meta_path, meta_dict, remote_dir|None) of the one in-flight async save.
_PENDING: Optional[Tuple[str, Dict[str, Any], Optional[str]]] = None
# In-flight background upload of the previous checkpoint, if any.
_UPLOAD = None


def _upload_dir(local_dir: str, remote_dir: str) -> None:
    """Mirror a complete checkpoint dir to the remote. The completeness
    marker uploads LAST so a remote reader applies the same is-it-complete
    rule as a local one (reference: the trainer's save_folder may be a
    bucket, yamls 'Insert path to save folder or bucket')."""
    from diffusion_tpu.data.object_store import ObjectStore
    store = ObjectStore()
    marker = None
    for dirpath, _, files in os.walk(local_dir):
        for f in files:
            src = os.path.join(dirpath, f)
            rel = os.path.relpath(src, local_dir)
            if rel == _COMPLETE:
                marker = src
                continue
            store.upload(src, f"{remote_dir.rstrip('/')}/{rel}")
    if marker is not None:
        store.upload(marker, f"{remote_dir.rstrip('/')}/{_COMPLETE}")


def _drain_upload() -> None:
    """Wait for the in-flight background upload; raise if it failed (the
    error surfaces at the next save/load/close, never silently)."""
    global _UPLOAD
    if _UPLOAD is None:
        return
    t, errbox, _ = _UPLOAD
    _UPLOAD = None
    t.join()
    if errbox:
        raise errbox[0]


def drain_remote_uploads() -> None:
    """Block until the background remote upload (if any) is done; raise its
    error. Call before process exit — a durable *remote* checkpoint is the
    contract when save_remote is configured."""
    _drain_upload()


def _start_upload(local_dir: str, remote_dir: str) -> None:
    global _UPLOAD
    _drain_upload()  # one at a time, surface previous failures
    import threading
    errbox: list = []

    def run():
        try:
            _upload_dir(local_dir, remote_dir)
        except BaseException as e:  # noqa: BLE001 — re-raised at drain
            errbox.append(e)

    t = threading.Thread(target=run, daemon=True, name="ckpt-upload")
    t.start()
    _UPLOAD = (t, errbox, local_dir)


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def finalize_pending() -> None:
    """Block until the in-flight async save (if any) is durable, then write
    its completeness marker (and kick off the remote upload when one is
    configured). Raises here if the background write failed — callers see
    the error at the next save/load/close instead of never."""
    global _PENDING
    if _PENDING is None:
        _drain_upload()
        return
    meta_path, meta, remote = _PENDING
    _PENDING = None
    _checkpointer().wait_until_finished()
    if jax.process_index() == 0:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, meta_path)
        if remote:
            local_dir = os.path.dirname(meta_path)
            _start_upload(local_dir,
                          f"{remote.rstrip('/')}/"
                          f"{os.path.basename(local_dir)}")


def save_checkpoint(save_folder: str, batch: int, train_state: Any,
                    meta: Optional[Dict[str, Any]] = None,
                    overwrite: bool = True, wait: bool = True,
                    remote: Optional[str] = None) -> str:
    """Write <folder>/ba<batch>/{state, meta.json}. Multi-host safe: orbax
    coordinates the array shards; only process 0 writes meta.json.

    Crash-safe overwrite ordering: the completeness marker (meta.json) is
    deleted FIRST, so a crash anywhere during the rewrite leaves a directory
    that `latest_checkpoint_path` skips, never a marker pointing at partial
    state (Composer's atomic-checkpoint semantics). All hosts barrier after
    the cleanup so no one starts orbax's coordinated save against a
    directory another host is still deleting. meta.json itself is written
    via tmp+rename (atomic on POSIX).

    wait=False returns as soon as the arrays are copied off device (orbax's
    StandardCheckpointer async contract) and lets training overlap the disk
    write; the marker is written by `finalize_pending()` — called here on
    the next save, by the load/discovery paths, and by Trainer.close — so a
    crash mid-write still leaves only an unmarked (skipped) directory. At
    most one save is in flight.

    remote=<s3://|gs://|path> mirrors the finalized checkpoint there in a
    background thread (marker last; upload errors surface at the next
    save/finalize/drain). Multi-host: save_folder must be one SHARED
    directory (orbax's own requirement) — process 0 uploads it."""
    from diffusion_tpu.parallel import dist

    global _PENDING
    finalize_pending()  # at most one in-flight save; also orders overwrites
    path = os.path.join(save_folder, f"ba{batch}")
    state_path = os.path.join(path, "state")
    meta_path = os.path.join(path, _COMPLETE)
    if os.path.exists(state_path) or os.path.exists(meta_path):
        if not overwrite:
            raise FileExistsError(f"{path} exists and save_overwrite=False")
        if _UPLOAD is not None and \
                os.path.abspath(_UPLOAD[2]) == os.path.abspath(path):
            _drain_upload()  # don't delete the dir out from under its mirror
        if jax.process_index() == 0:
            if os.path.exists(meta_path):
                os.remove(meta_path)
            if os.path.exists(state_path):
                shutil.rmtree(state_path)
    # barrier UNCONDITIONALLY: gating it on a per-host exists() check is
    # racy on shared filesystems (host 1 can observe the dir only after
    # host 0 deleted it, skip the barrier, and enter orbax's coordinated
    # save while host 0 still waits -> mismatched collectives)
    dist.barrier("ckpt_cleanup")
    ckptr = _checkpointer()
    ckptr.save(os.path.abspath(state_path), train_state)
    if wait:
        ckptr.wait_until_finished()
        if jax.process_index() == 0:
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(meta or {}, f)
            os.replace(tmp, meta_path)
            if remote:
                _start_upload(path,
                              f"{remote.rstrip('/')}/{os.path.basename(path)}")
    else:
        _PENDING = (meta_path, meta or {}, remote)
    return path


def load_checkpoint(path: str, abstract_state: Any,
                    partial: bool = False) -> Tuple[Any, Dict[str, Any]]:
    """Restore a checkpoint dir into the sharding/structure of
    `abstract_state` (jax.eval_shape output with shardings attached).

    partial=True restores only the subtree present in `abstract_state`
    (weights-only loads from checkpoints that carry opt/EMA state, the
    reference's `load_weights_only`, fid-clip-evaluation.py:103-105)."""
    finalize_pending()  # an async save of this very path may be in flight
    state_path = os.path.abspath(os.path.join(path, "state"))
    if partial:
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(
                state_path,
                args=ocp.args.PyTreeRestore(item=abstract_state,
                                            partial_restore=True))
    else:
        restored = _checkpointer().restore(state_path, abstract_state)
    meta_path = os.path.join(path, _COMPLETE)
    meta: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restored, meta


def prune_checkpoints(save_folder: str, keep: int) -> None:
    """Delete the oldest checkpoints so at most `keep` remain (Composer's
    `save_num_checkpoints_to_keep`; keep <= 0 keeps everything). Counts the
    one possibly in-flight async save as the newest without blocking on it,
    and only ever deletes *complete* (marked) directories — an unmarked dir
    is either the in-flight save or a crashed write that autoresume already
    skips. Multi-host: only process 0 deletes; no barrier needed because no
    host will collectively write into a pruned (old) directory. Remote
    mirrors (save_remote) are NOT pruned — the bucket is the durable
    history; apply lifecycle rules there."""
    if keep <= 0 or not save_folder or not os.path.isdir(save_folder):
        return
    complete = []
    for name in os.listdir(save_folder):
        m = _BA_RE.match(name)
        if not m:
            continue
        full = os.path.join(save_folder, name)
        if os.path.exists(os.path.join(full, _COMPLETE)):
            complete.append((int(m.group(1)), full))
    complete.sort()
    uploading = (os.path.abspath(_UPLOAD[2])
                 if _UPLOAD is not None and _UPLOAD[0].is_alive() else None)
    # the in-flight save counts toward the budget as newest, but an UNMARKED
    # save is not yet durable — with keep=1 we must still hold the newest
    # complete dir until the pending one finalizes (else a crash mid-write
    # leaves zero resumable checkpoints); it ages out at the next prune
    budget = max(keep - 1, 1) if _PENDING is not None else keep
    excess = complete[:-budget] if budget > 0 else complete
    # never rip a dir out from under its in-flight remote upload — it ages
    # out at a later prune once the mirror is done
    excess = [(n, f) for n, f in excess if os.path.abspath(f) != uploading]
    if jax.process_index() == 0:
        for _, full in excess:
            # marker first: a crash mid-rmtree leaves an unmarked dir that
            # discovery skips, never a marker over a half-deleted state
            os.remove(os.path.join(full, _COMPLETE))
            shutil.rmtree(full, ignore_errors=True)


def checkpoint_batch(path: str) -> int:
    m = _BA_RE.match(os.path.basename(os.path.normpath(path)))
    return int(m.group(1)) if m else -1


def sync_from_remote(save_folder: str, remote: str) -> Optional[str]:
    """Make the newest *remote* checkpoint available locally (autoresume on
    a fresh host: the reference trains with bucket save_folders, so resume
    must not depend on local disk surviving). Downloads only when the remote
    has a complete ba<N> newer than the local latest; marker lands last so a
    partially-downloaded dir is skipped like a partially-written one.
    Returns the local path of the downloaded dir, or None if local is
    already current. Only process 0 downloads; callers barrier after."""
    finalize_pending()
    from diffusion_tpu.data.object_store import ObjectStore
    store = ObjectStore()
    keys = store.list_prefix(remote)
    best_n, best_name = -1, None
    for k in keys:
        parts = k.replace("\\", "/").split("/")
        if len(parts) == 2 and parts[1] == _COMPLETE:
            m = _BA_RE.match(parts[0])
            if m and int(m.group(1)) > best_n:
                best_n, best_name = int(m.group(1)), parts[0]
    if best_name is None:
        return None
    local_latest = latest_checkpoint_path(save_folder)
    if local_latest is not None and checkpoint_batch(local_latest) >= best_n:
        return None
    dest = os.path.join(save_folder, best_name)
    if jax.process_index() == 0:
        prefix = f"{remote.rstrip('/')}/{best_name}/"
        files = [k.split("/", 1)[1] for k in keys
                 if k.replace("\\", "/").startswith(best_name + "/")]
        for rel in sorted(files, key=lambda r: r == _COMPLETE):  # marker last
            store.download(prefix + rel, os.path.join(dest, rel))
    return dest


_REMOTE_SCHEMES = ("s3://", "gs://", "file://")


def fetch_checkpoint_dir(checkpoint_path: str,
                         cache_dir: Optional[str] = None) -> str:
    """Resolve a checkpoint path that may live in an object store to a
    local directory (the reference endpoint downloads its checkpoint from a
    bucket before loading, reference inference_model.py:19-22 get_file).

    Local paths pass through untouched. `s3://`, `gs://` and `file://`
    (tests, network mounts) are mirrored into a content-keyed cache dir —
    idempotent across restarts via a completeness marker, so a redeployed
    server only downloads once. Unsupported schemes fail HERE with a clear
    message instead of deep inside orbax."""
    if "://" in checkpoint_path and \
            not checkpoint_path.startswith(_REMOTE_SCHEMES):
        scheme = checkpoint_path.split("://", 1)[0]
        raise ValueError(
            f"unsupported checkpoint scheme {scheme}:// "
            f"({checkpoint_path}); supported: a local directory, "
            f"s3://, gs://, or file://")
    if not checkpoint_path.startswith(_REMOTE_SCHEMES):
        return checkpoint_path
    src = checkpoint_path[7:] if checkpoint_path.startswith("file://") \
        else checkpoint_path
    import hashlib

    from diffusion_tpu.data.object_store import ObjectStore
    digest = hashlib.sha1(checkpoint_path.encode()).hexdigest()[:16]
    dest = os.path.join(
        cache_dir or os.path.join(os.path.expanduser("~/.cache"),
                                  "diffusion_tpu", "serving_ckpt"),
        digest)
    marker = os.path.join(dest, ".fetched")
    if os.path.exists(marker):
        return dest
    store = ObjectStore()
    keys = store.list_prefix(src)
    if not keys:
        raise FileNotFoundError(
            f"no objects under checkpoint path {checkpoint_path}")
    for rel in keys:
        store.download(f"{src.rstrip('/')}/{rel}", os.path.join(dest, rel))
    with open(marker, "w") as f:
        f.write(checkpoint_path + "\n")
    return dest


def latest_checkpoint_path(save_folder: str) -> Optional[str]:
    """Highest complete ba<N> under save_folder (autoresume discovery)."""
    finalize_pending()  # in-process autoresume right after an async save
    if not save_folder or not os.path.isdir(save_folder):
        return None
    best, best_n = None, -1
    for name in os.listdir(save_folder):
        m = _BA_RE.match(name)
        if not m:
            continue
        full = os.path.join(save_folder, name)
        if not os.path.exists(os.path.join(full, _COMPLETE)):
            continue  # incomplete/interrupted write
        n = int(m.group(1))
        if n > best_n:
            best, best_n = full, n
    return best
