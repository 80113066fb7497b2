#!/bin/bash
# TPU measurement queue — run when the axon tunnel recovers.
# Usage: bash scratch/tpu_queue.sh 2>&1 | tee /tmp/tpu_queue.log
set -u
cd /root/repo
echo "=== probe ==="
timeout 150 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform=='tpu'" || { echo "TPU STILL DOWN"; exit 1; }

echo "=== 1) headline 131k (default env, regression check vs 1.49e8) ==="
timeout 1200 python bench.py

echo "=== 2) 1M regime, auto kernel (was 7.2e7) ==="
BENCH_NX=64 BENCH_NY=64 BENCH_NZ=256 BENCH_N1=20 BENCH_N2=120 timeout 2400 python bench.py

echo "=== 3) 1M regime, pallas_mxu kernel ==="
BENCH_NX=64 BENCH_NY=64 BENCH_NZ=256 BENCH_N1=20 BENCH_N2=120 BENCH_EKERNEL=pallas_mxu timeout 2400 python bench.py

echo "=== 4) 131k, pallas_mxu (gate-widening check) ==="
BENCH_EKERNEL=pallas_mxu timeout 1200 python bench.py

echo "=== 5) N22k chunk-unroll sweep (auto-default validation) ==="
timeout 2400 python benchmarks/sweep_unroll_n22k.py

echo "=== 6) halo 1-shard vs single-chip fast path (verdict #3 done-bar) ==="
timeout 2400 python benchmarks/halo_tpu_bench.py

echo "=== 7) pod-shard regime: 1M halo 1-shard, MXU kernel ==="
NX=64 NY=64 NZ=256 N1=20 N2=120 EKERNEL=pallas_mxu timeout 3600 python benchmarks/halo_tpu_bench.py

echo "=== 7b) 1M pallas_mxu tile sweep (DMA-issue amortization) ==="
for TE in 2048 4096; do
  echo "--- HAKAI_MXU_TILE=$TE"
  HAKAI_MXU_TILE=$TE BENCH_EKERNEL=pallas_mxu \
    BENCH_NX=64 BENCH_NY=64 BENCH_NZ=256 BENCH_N1=20 BENCH_N2=120 \
    timeout 2400 python bench.py || echo "(failed — recorded)"
done

echo "=== 8) 1M scoped-VMEM budget probe (compiler_options; XLA_FLAGS"
echo "       FATALs locally on unknown TPU flags under the tunnel) ==="
timeout 3600 python benchmarks/scoped_vmem_probe.py || echo "(failed — recorded)"

echo "=== queue done ==="

echo "=== 9) contact decks re-validation (crash-tube + N2k) ==="
timeout 2400 python benchmarks/contact_decks_bench.py || echo "(failed)"
