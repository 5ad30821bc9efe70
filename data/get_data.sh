#!/usr/bin/env bash
# Fetch a prepared MS-CNN dataset bundle (window files + images).
#
# Equivalent of the reference's per-dataset scripts
# (/root/reference/data/get_{kitti,caltech,citypersons,widerface}_data.sh),
# parameterized over the dataset name. Each bundle unpacks to
# data/<dataset>/ with the layout described in docs/DATA.md.
#
# Usage: ./get_data.sh {kitti|caltech|citypersons|widerface}

set -euo pipefail

ds="${1:?usage: $0 {kitti|caltech|citypersons|widerface}}"
case "$ds" in
  kitti|caltech|citypersons|widerface) ;;
  *) echo "unknown dataset '$ds'" >&2; exit 1 ;;
esac

url="http://www.svcl.ucsd.edu/projects/mscnn/${ds}_data.zip"
echo "Fetching ${ds} data from ${url} ..."
wget -c "$url"
unzip "${ds}_data.zip" && rm -f "${ds}_data.zip"
echo "Done. See docs/DATA.md for the expected layout and next steps."
