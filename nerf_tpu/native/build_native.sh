#!/usr/bin/env bash
# Build the native components (C++). Run from anywhere.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libsnapshot_codec.so snapshot_codec.cpp
echo "built $(pwd)/libsnapshot_codec.so"
g++ -O3 -std=c++17 -o render_server_native render_server.cpp
echo "built $(pwd)/render_server_native"
