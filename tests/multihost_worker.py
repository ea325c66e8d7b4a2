"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Runs as `python multihost_worker.py <coordinator> <num_procs> <pid> <tmpdir>`.
Exercises every `process_count() > 1` branch the single-process suite cannot
reach: jax.distributed init, make_global_batch from per-host shards,
length_sync agreement on uneven iterators, dist.barrier, and a 2-host orbax
checkpoint save + restore (the reference's WORLD_SIZE=2 CI intent,
reference Makefile:9-15, .github/workflows/pytest-cpu.yaml:57)."""

import os
import sys

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    coordinator, num_procs, pid, tmpdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from diffusion_tpu.parallel import dist

    dist.initialize(coordinator_address=coordinator,
                    num_processes=num_procs, process_id=pid)
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.device_count() == 2 * num_procs
    assert dist.get_global_rank() == pid
    assert dist.is_coordinator() == (pid == 0)

    # ---- make_global_batch: per-host shards -> one global array
    from jax.sharding import Mesh
    from diffusion_tpu.parallel.sharding import make_global_batch

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2), ("fsdp", "data"))
    host_batch = {"x": np.full((2, 3), pid, np.float32)}
    global_batch = make_global_batch(host_batch, mesh)
    assert global_batch["x"].shape == (4, 3), global_batch["x"].shape
    # fully replicated gather: each host contributed its own rows
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(global_batch["x"], tiled=True)
    col = np.sort(np.asarray(gathered)[:, 0])
    np.testing.assert_array_equal(col, [0, 0, 1, 1])

    # ---- length_sync: uneven hosts agree on the common length
    from diffusion_tpu.data.datapipes import length_sync

    n_local = 3 if pid == 0 else 2
    seen = sum(1 for _ in length_sync(iter(range(n_local))))
    assert seen == 2, seen

    # ---- barrier
    dist.barrier("multihost-test")

    # ---- 2-host sharded checkpoint save + restore
    from diffusion_tpu.train import checkpoint as ckpt
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("fsdp"))
    arr = jax.make_array_from_process_local_data(
        sharding, np.arange(2, dtype=np.float32) + 10 * pid)
    state = {"w": arr}
    path = ckpt.save_checkpoint(tmpdir, 7, state, {"timestamp": {"batch": 7}})
    dist.barrier("after-save")
    abstract = {"w": jax.ShapeDtypeStruct((4,), np.float32, sharding=sharding)}
    restored, meta = ckpt.load_checkpoint(path, abstract)
    got = np.sort(np.asarray(
        multihost_utils.process_allgather(restored["w"], tiled=True)))
    np.testing.assert_array_equal(got, [0, 1, 10, 11])
    assert meta["timestamp"]["batch"] == 7

    # ---- remote mirror + fresh-host autoresume sync (trainer's
    # save_remote flow: process 0 uploads/downloads, everyone barriers,
    # then a coordinated sharded load from the synced local copy)
    remote = os.path.join(tmpdir, "bucket")
    ckpt.save_checkpoint(tmpdir, 9, state, {"timestamp": {"batch": 9}},
                         wait=False, remote=remote)
    ckpt.finalize_pending()
    ckpt.drain_remote_uploads()
    dist.barrier("after-upload")
    if pid == 0:
        assert os.path.exists(os.path.join(remote, "ba9", "meta.json"))

    fresh = os.path.join(tmpdir, f"fresh")
    ckpt.sync_from_remote(fresh, remote)
    dist.barrier("after-sync")
    latest = ckpt.latest_checkpoint_path(fresh)
    assert latest is not None and latest.endswith("ba9"), latest
    restored2, meta2 = ckpt.load_checkpoint(latest, abstract)
    got2 = np.sort(np.asarray(
        multihost_utils.process_allgather(restored2["w"], tiled=True)))
    np.testing.assert_array_equal(got2, [0, 1, 10, 11])
    assert meta2["timestamp"]["batch"] == 9

    print(f"MULTIHOST-OK pid={pid}")


if __name__ == "__main__":
    main()
