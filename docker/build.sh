#!/bin/sh
# reference: docker/build.sh:1-4
cd "$(dirname "$0")/.."
docker build -f docker/Dockerfile -t pcdet-tpu-docker .
