#!/bin/sh
# Build the optional native scan kernel and install it next to the
# Python kernel module (tl_spark/kernel/_tl_native.so). Dev-only; the
# built artifact is committed so driver runs don't need a toolchain.
set -e
cd "$(dirname "$0")/../native/tl_native"
cargo build --release
cp target/release/libtl_native.so ../../tl_spark/kernel/_tl_native.so
echo "installed tl_spark/kernel/_tl_native.so"
