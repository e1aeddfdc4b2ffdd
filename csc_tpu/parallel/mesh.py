"""dp x sp mesh construction + stream-batch sharding helpers."""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_stream_mesh(n_devices=None, sp=None):
    """Build a (dp, sp) mesh over the first n_devices.

    dp shards independent archiver tasks; sp shards -p splits of a single
    file (csarc.cpp:532-543).  Both axes shard the stream batch dimension;
    the factorization only affects how work maps to the physical topology.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if sp is None:
        sp = 2 if n % 2 == 0 and n > 1 else 1
    dp = n // sp
    return Mesh(np.array(devs[:dp * sp]).reshape(dp, sp), ("dp", "sp"))


def batch_sharding(mesh):
    """Sharding for arrays whose leading axis is the stream batch."""
    return NamedSharding(mesh, P(("dp", "sp")))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_state(state, mesh, batch):
    """Place a decode/encode scan state dict on the mesh: batch-leading
    arrays shard over (dp, sp), everything else replicates."""
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == batch:
            return jax.device_put(x, bs)
        return jax.device_put(x, rep)

    return {k: place(v) for k, v in state.items()}


def decode_batch_sharded(props_list, blobs, positions=None, out_sizes=None,
                         mesh=None):
    """decode_batch with the device state sharded over a stream mesh.

    The batch is padded to a multiple of the mesh size (idle pad streams
    terminate immediately on their zeroed inputs being invalid — they are
    marked done by construction via empty block tables).
    """
    from ..ops import framing
    from ..ops.pipeline import decode_batch

    if mesh is None:
        mesh = make_stream_mesh()
    n = mesh.size
    b = len(blobs)
    pad = (-b) % n
    if pad:
        # replicate the last stream into pad slots; outputs discarded
        props_list = list(props_list) + [props_list[-1]] * pad
        blobs = list(blobs) + [blobs[-1]] * pad
        if positions is not None:
            positions = list(positions) + [positions[-1]] * pad
        if out_sizes is not None:
            out_sizes = list(out_sizes) + [out_sizes[-1]] * pad
    outs = decode_batch(props_list, blobs, positions, out_sizes,
                        _mesh=mesh)
    return outs[:b]
