#!/bin/bash
# Round-4 artifact queue (VERDICT r3 #6 + #2-A/B + crystal record): every
# headline number in README/PARITY gets a {command, result} JSON under
# artifacts/. Sequential — one TPU chip.
set -x
cd /root/repo

# 1. North-star headline (16q cross_mesh, staged recipe, <5 min target)
timeout 900 python examples/north_star.py \
    --artifact artifacts/north_star_headline.json
# 2. Quantum-contribution ablation: same budget, circuit replaced by identity
timeout 900 python examples/north_star.py --no-quantum \
    --artifact artifacts/north_star_no_quantum.json
# 3. Classical Hopfield baseline at the same budget
timeout 900 python examples/north_star.py --solver classical \
    --artifact artifacts/north_star_classical.json
# 4. Honest single-phase 6q row (PARITY "6q re-measure")
timeout 600 python examples/north_star.py --qubits 6 --stage1-minutes 0 \
    --minutes 2 --total-steps 4000 \
    --artifact artifacts/north_star_6q.json

# 5. Crystal-growth pipeline record (reference recipe: classical warmup,
#    then SPSA on the quantum weights with constant gains)
timeout 900 python -m qcpinn_tpu.cli crystal --warmup-epochs 200 \
    --spsa-steps 100 --artifact artifacts/crystal_growth.json

# 6. SPSA A/B on the 4q diffusion config: full-tree vs split (reference
#    recipe), same seed/budget, exact evaluation
timeout 900 python -m qcpinn_tpu.cli train --problem diffusion --solver DV \
    --ansatz cascade --num-qubits 4 --num-layers 1 --hidden-dim 50 \
    --epochs 3000 --batch-size 64 --lr 5e-3 --seed 7 --print-every 500 \
    --gradient-mode spsa --metrics-json artifacts/spsa_ab_full.json \
    --no-plots --output-dir runs
timeout 900 python -m qcpinn_tpu.cli train --problem diffusion --solver DV \
    --ansatz cascade --num-qubits 4 --num-layers 1 --hidden-dim 50 \
    --epochs 3000 --batch-size 64 --lr 5e-3 --seed 7 --print-every 500 \
    --gradient-mode spsa-split --metrics-json artifacts/spsa_ab_split.json \
    --no-plots --output-dir runs
echo "ALL DONE"
