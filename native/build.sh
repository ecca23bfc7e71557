#!/bin/bash
# Build the native host runtime (latent prefetcher + BPE tokenizer).
set -e
cd "$(dirname "$0")"
g++ -O2 -std=c++17 -shared -fPIC -pthread comat_host.cpp -o libcomat_host.so
echo "built native/libcomat_host.so"
