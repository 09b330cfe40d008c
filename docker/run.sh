#!/bin/sh
# Reference docker/run.sh analog: run the offline SLAM CLI in the container
# with the current directory mounted for bags/output.
# usage: docker/run.sh --bag /data/hdl_501.bag --preset indoor --out-map /data/map.pcd
exec docker run --rm -v "$(pwd)":/data hdl-graph-slam-tpu \
    python -m hdl_graph_slam_tpu.run "$@"
