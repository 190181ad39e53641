"""Distribution layer: meshes, GSPMD sharding, halo-exchange shard_map,
data-parallel sweeps.  All net-new vs the single-process reference."""

from ofot_tpu.parallel import mesh, gspmd, halo, sweep  # noqa: F401
