#!/bin/bash
# Fetch the public sample sequences the demos/evals expect
# (reference tools/download_sample_data.sh counterpart; same public sources).
# Requires network access; run from the repo root.
set -e

mkdir -p datasets && cd datasets

# TartanAir sample (abandonedfactory) — needs `gdown`
gdown https://drive.google.com/uc?id=1AlfhZnGmlsKWGcNHFB1i8i8Jzn4VHB15
unzip -q abandonedfactory.zip && rm abandonedfactory.zip

# Tanks & Temples Barn sequence — needs `gdown`
gdown https://drive.google.com/uc?id=0B-ePgl6HF260NzQySklGdXZyQzA
unzip -q Barn.zip && rm Barn.zip

# ETH3D-SLAM mono bench
wget -q https://www.eth3d.net/data/slam/datasets/sfm_bench_mono.zip
unzip -q sfm_bench_mono.zip && rm sfm_bench_mono.zip

# TUM-RGBD freiburg3 cabinet
wget -q https://vision.in.tum.de/rgbd/dataset/freiburg3/rgbd_dataset_freiburg3_cabinet.tgz
tar -zxf rgbd_dataset_freiburg3_cabinet.tgz && rm rgbd_dataset_freiburg3_cabinet.tgz

# EuRoC MAV MH_03 (ground truth is read from the sequence's own
# mav0/state_groundtruth_estimate0/data.csv — see tools/euroc_groundtruth.py)
wget -q http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset/machine_hall/MH_03_medium/MH_03_medium.zip
unzip -q MH_03_medium.zip && rm MH_03_medium.zip

cd ..
