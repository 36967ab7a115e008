"""Golden iteration-count / solution-norm regression tests.

The reference's correctness signals are the Krylov iteration count and
the solution norm printed at fixed configurations
(src/main.cpp:232-233); its CI pins behavior by running fixed sizes
(ccpp.yml).  These tests pin the EXACT iteration counts and the norms
(to 1e-9 relative — reduction-order headroom) for the CI-scale configs
in float64 on CPU, so any solver/assembly/preconditioner drift is
caught immediately.

If a deliberate algorithm change shifts these values, re-baseline in
the same commit and say why in its message.
"""

import numpy as np
import pytest

from tpufem.cli import parse_args, solve


def run_cli(argv):
    return solve(parse_args(argv))


GOLDEN = [
    # (argv, iterations, norm)  — values recorded 2026-08-16
    (["--problem_type", "poisson", "--ndofs", "15000",
      "--scaling_type", "weak", "--num_shards", "1",
      "--dtype", "float64", "-ksp_rtol", "1e-8"],
     9, 26.535020301876788),
    # reference CI job 1 size (ccpp.yml:56-70: 50k weak)
    (["--problem_type", "poisson", "--ndofs", "50000",
      "--scaling_type", "weak", "--num_shards", "1",
      "--dtype", "float64", "-ksp_rtol", "1e-8"],
     10, 48.94285576880367),
    # reference CI job 3 (order 3)
    (["--problem_type", "poisson", "--ndofs", "15000", "--order", "3",
      "--num_shards", "1", "--dtype", "float64", "-ksp_rtol", "1e-8"],
     19, 25.64720150160304),
    # reference CI elasticity size (100k strong)
    (["--problem_type", "elasticity", "--ndofs", "100000",
      "--scaling_type", "strong", "--num_shards", "1",
      "--dtype", "float64"],
     18, 6.784162962970475e-05),
    # matrix-free cgpoisson: fixed 100 iterations (kmax), norm must match
    # the assembled poisson solve at the same size to ~8 digits
    (["--problem_type", "cgpoisson", "--ndofs", "15000",
      "--num_shards", "1", "--dtype", "float64"],
     100, 26.535020300527723),
    # sharded paths (virtual 8-device mesh): slab GMG strong scaling
    # (the mpirun -np N analogue) and the rowshard elasticity path
    (["--problem_type", "poisson", "--ndofs", "100000",
      "--scaling_type", "strong", "--num_shards", "8",
      "--dtype", "float64", "-ksp_rtol", "1e-8"],
     11, 68.43884037046897),
    (["--problem_type", "elasticity", "--ndofs", "10000",
      "--scaling_type", "weak", "--num_shards", "4",
      "--dtype", "float64"],
     20, 4.3635484081745004e-05),
]


@pytest.mark.parametrize("argv,gold_it,gold_norm", GOLDEN,
                         ids=["poisson15k", "poisson50k", "order3",
                              "elasticity100k", "cgpoisson15k",
                              "poisson100k-8shard",
                              "elasticity10k-4shard"])
def test_golden(argv, gold_it, gold_norm):
    it, norm = run_cli(argv)
    assert it == gold_it
    assert abs(norm - gold_norm) < 1e-9 * abs(gold_norm)
