"""Pallas TPU kernels — QUARANTINED research artifacts, not production paths.

Both kernels here are bitwise-correct (interpret-mode parity tests run on
CPU in CI: tests/test_pallas.py) but MEASURED SLOWER than the XLA
formulations they re-implement, and no production code imports them:

  * census_pallas.census_pallas — 14x slower than ops.matchers.census at
    usable tile sizes (round 2; grid overhead, compile blow-up at larger
    tiles).
  * census_aml_pallas.census_aml_pallas — the fused census+AML one-VMEM-pass
    variant; 29x slower (22.9 ms vs 0.80 ms at bench feature shapes,
    round 3; the disparity fori_loop's dynamic-start shifts lower to
    per-iteration relayouts in Mosaic, and larger row tiles fail TPU
    compilation).

Conclusion (PERF.md round 3): the matcher stage's gather + popcount +
masked-softmax pattern is what XLA fusion already executes near HBM
bandwidth; hand-scheduling it in Pallas removes the compiler's freedom
without adding any. Kept for the record and as Pallas reference code.
"""
