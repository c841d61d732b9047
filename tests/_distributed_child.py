"""Child process body for the real 2-process jax.distributed test.

Each child joins a localhost coordinator (process_id from argv), then runs
the PRODUCTION --multihost CLI path: frame-range sharding of one video,
segment render, atomic part publish, last-finisher stitch. No mocked
process_index — jax.process_index()/process_count() come from the live
distributed runtime.
"""

import sys


def main() -> int:
    role, port, video, outdir = (int(sys.argv[1]), sys.argv[2], sys.argv[3],
                                 sys.argv[4])
    dp = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    import jax

    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=role,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == role, (jax.process_index(), role)
    if dp > 1:
        # the multihost+dp combination shards tiles over LOCAL devices
        assert len(jax.local_devices()) >= dp, jax.local_devices()

    from waifu2x_tensorrt_tpu.cli import main as cli_main

    rc = cli_main([
        "--model", "swin_unet/art", "--scale", "2", "--noise", "-1",
        "--batchSize", "2", "--tileSize", "64", "--precision", "tf32",
        "--allow-random-weights", "--multihost", "--dp", str(dp),
        "render", "-i", video, "-o", outdir,
    ])
    # leave the runtime cleanly so the coordinator shutdown barrier does
    # not hang the peer
    jax.distributed.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
