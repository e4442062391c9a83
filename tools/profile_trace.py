"""Profile one IVC step's host-side trace construction at 2^16 rows.

Isolates the Python arithmetizer cost (BENCH_NOTES run 3: ~60 s/step not
accounted for by the device prover) to direct the optimization work.
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from halo_tpu.frontend import ivc


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    t0 = time.time()
    params = ivc.freeze_ivc_circuits(rows)
    print(f"freeze/load params: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    state = ivc.IVCState.init(params)
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    import random

    rng = random.Random(4242)
    from halo_tpu.curves import PALLAS, ec_mul

    pk_next = ec_mul(PALLAS, PALLAS.generator, rng.randrange(1, PALLAS.r))
    accs = (state.fp_public_input.acc_prev, state.fq_public_input.acc_prev)

    for rep in range(2):
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        fp_trace, fq_trace = ivc.build_ivc_traces(
            rows,
            params.fp_circuit.public_input_count,
            params.fq_circuit.public_input_count,
            state,
            pk_next,
            fp_circuit=params.fp_circuit,
            fq_circuit=params.fq_circuit,
            accs=accs,
        )
        fp_trace.consume()
        fq_trace.consume()
        pr.disable()
        label = "cold(static-cache miss + compiles)" if rep == 0 else "warm(cache hit)"
        print(f"build_ivc_traces + consume [{label}]: {time.time() - t0:.1f}s",
              flush=True)
        if rep == 1:
            s = io.StringIO()
            ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
            ps.print_stats(25)
            print(s.getvalue())


if __name__ == "__main__":
    main()
