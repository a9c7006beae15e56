"""On-device timing harness — canonical implementation lives in
aule_tpu.utils.profiling.benchmark; this alias keeps probe scripts short.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from aule_tpu.utils.profiling import benchmark  # noqa: E402


def devtime(fn, *args, n_iters=100, reps=3):
    return benchmark(fn, *args, iters=n_iters, reps=reps)
