#!/bin/bash
cd /root/repo
echo "=== reference ADC (aggressive) ==="
python scripts/train_synthetic.py --iterations 1500 --capacity 32768 \
  --gt_gaussians 6000 --init_fraction 0.12 --height 256 --width 384 \
  --max_pairs 262144 --views 16 --adc_mode reference --max_grad 0.002
echo "=== paper ADC (aggressive) ==="
python scripts/train_synthetic.py --iterations 1500 --capacity 32768 \
  --gt_gaussians 6000 --init_fraction 0.12 --height 256 --width 384 \
  --max_pairs 262144 --views 16 --adc_mode paper --densify_grad_threshold 0.00005
echo ADC_AB2_DONE
