#!/bin/bash
# Round-3 on-chip measurement suite — run the moment the TPU tunnel is back.
# One TPU process at a time (device lock); each step under timeout with logs.
set -u
OUT=${1:-output/r3_chip}
mkdir -p "$OUT"
cd /root/repo

run() {  # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name  $(date +%H:%M:%S)" | tee -a "$OUT/suite.log"
  timeout "$to" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "    rc=$rc" | tee -a "$OUT/suite.log"
  tail -25 "$OUT/$name.err" >> "$OUT/suite.log"
}

# 0. device identity (device_kind decides SparseCore availability)
run device 300 python -c "
import os; os.environ.setdefault('JAX_COMPILATION_CACHE_DIR','/root/.cache/jax-comp-cache')
import jax; d=jax.devices()[0]
print('device_kind:', d.device_kind, 'platform:', d.platform)
import jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))"

# 1. the gather probes (decide w3's fate + record the DMA issue rate)
run dma_gather 1800 python scripts/exp_dma_gather.py

# 2. all-generation bench (bench.py now times v1/v2/v2rg/w3 in ONE
#    interleaved process and headlines the fastest realistic config);
#    per-config compile failures are isolated, so a w3 Mosaic failure
#    costs only that config
run bench_all 4800 python bench.py

# 3. v2 min/max gradient kernels: PNA train-step A/B
run pna_train 3000 python scripts/exp_pna_train.py

# 4. pretrain width sweep (v1 vs v2 slicings vs grad accumulation)
run pretrain_width 4800 python scripts/exp_pretrain_width.py

# 5. the plain driver bench (default config, headline numbers)
run bench 3000 python bench.py

# 6. serving latency recheck (p50/p99 warm, bs 1 and 8)
run serve 1800 python scripts/exp_serve_latency.py

# 7. CLQA grouped training: round-bucket jit-variant count + first-step
#    (compile-inclusive) wall time — the VERDICT-r2 compile-cost number.
#    Last: its cold compile is the longest (cache makes reruns fast).
run clqa_train 3600 python scripts/chip_query_train.py --steps 4 --grouped

echo "=== suite done $(date +%H:%M:%S)" | tee -a "$OUT/suite.log"
