#!/bin/sh
# Run the pcdet-tpu image on a Cloud TPU VM (reference: docker/run.sh:1-17,
# minus its X11 forwarding — there is no visualization GUI in this stack).
#
# TPU access from a container needs the accel device nodes + host network
# (the libtpu runtime coordinates over localhost gRPC); --privileged is the
# simple form, the --device /dev/accel* form is the narrow one.
EXCHANGE="${EXCHANGE:-$HOME/exchange}"
mkdir -p "$EXCHANGE"

docker run -it \
        --net=host \
        --privileged=true \
        --ipc=host \
        --hostname="inside-DOCKER" \
        --name="pcdet-tpu" \
        -e TPU_NAME -e TPU_WORKER_ID -e TPU_WORKER_HOSTNAMES \
        -v "$EXCHANGE":/root/exchange \
        pcdet-tpu-docker bash
