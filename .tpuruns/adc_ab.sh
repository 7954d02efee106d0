#!/bin/bash
cd /root/repo
echo "=== reference ADC ==="
python scripts/train_synthetic.py --iterations 1200 --capacity 32768 \
  --gt_gaussians 6000 --init_fraction 0.3 --height 256 --width 384 \
  --max_pairs 262144 --views 16 --adc_mode reference
echo "=== paper ADC ==="
python scripts/train_synthetic.py --iterations 1200 --capacity 32768 \
  --gt_gaussians 6000 --init_fraction 0.3 --height 256 --width 384 \
  --max_pairs 262144 --views 16 --adc_mode paper
echo ADC_AB_DONE
