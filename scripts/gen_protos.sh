#!/bin/bash
# Regenerate protobuf bindings (metta_tpu/protobuf/sim_gen) from proto/.
set -e
cd "$(dirname "$0")/.."
protoc -Iproto --python_out=/tmp/pbgen_$$ --python_out=metta_tpu/protobuf_tmp 2>/dev/null || true
rm -rf metta_tpu/protobuf_tmp /tmp/pbgen_$$
tmp=$(mktemp -d)
protoc -Iproto --python_out="$tmp" proto/metta_tpu/sim/*.proto
cp "$tmp"/metta_tpu/sim/*_pb2.py metta_tpu/protobuf/sim_gen/
rm -rf "$tmp"
echo "regenerated metta_tpu/protobuf/sim_gen"
