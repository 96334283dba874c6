#!/bin/sh
# Fetch the qoiformat.org reference image suite into tests/resources/
# (mirrors the reference's test/fetch_test_images.sh; the test suite falls
# back to a synthetic corpus when absent).
set -e
cd "$(dirname "$0")"
mkdir -p resources
cd resources
if [ ! -d qoi_test_images ]; then
    curl -LO https://qoiformat.org/qoi_test_images.zip
    unzip -q qoi_test_images.zip
    rm -f qoi_test_images.zip
fi
echo "corpus ready: $(ls qoi_test_images | wc -l) files"
