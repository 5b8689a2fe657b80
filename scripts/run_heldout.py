#!/usr/bin/env python
"""Run the bench's held-out synthetic accuracy section standalone.

Used when validating accuracy-relevant kernel/config changes against the
full guardrail set without paying for a complete bench run.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_heldout.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_cfg, heldout_eval


def main():
    t0 = time.time()
    res = heldout_eval(make_cfg())
    res["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
