"""Run the warm 1-iteration e2e repeatedly in one process to find where
the tunnel dies (the bench's e2e extra lost the device in 3 of 4 runs)."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = ("/root/reference/test/data/DRB1-3123.fa.gz.pggb-s3000-p70-n10-a70-"
       "K16-k8-w10000-j5000-e5000.seqwish.gfa")


def main():
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine
    from smoothxg_tpu.pipeline.run import Config, run_smoothing

    nthreads = os.cpu_count() or 1
    engine = FusedPallasEngine(threads=nthreads)
    engine.warmup(locals_=(True,))
    print("warm ok", flush=True)
    for r in range(3):
        tmp = tempfile.mkdtemp(prefix=f"smx_e2e_loop{r}_")
        cfg = Config(
            gfa_in=REF, smoothed_out=os.path.join(tmp, "o.gfa"),
            n_haps=12, max_path_jump=5000, max_edge_jump=5000,
            poa_length_targets=[700], use_sgd=True, add_consensus=True,
            engine=engine, tmp_base=tmp, threads=nthreads)
        t0 = time.time()
        run_smoothing(cfg)
        print(f"e2e {r}: {time.time()-t0:.1f}s lost={engine.device_lost} "
              f"dev={engine.device_blocks}", flush=True)


if __name__ == "__main__":
    main()
