#!/bin/sh
# Build webcodec.zip for spark-submit --py-files (north_rule deployment shape).
set -e
cd "$(dirname "$0")/.."
rm -f webcodec.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("webcodec.zip", "w", zipfile.ZIP_DEFLATED) as zf:
    for root, _dirs, files in os.walk("webcodec"):
        for fn in files:
            if fn.endswith(".py"):
                zf.write(os.path.join(root, fn))
print("wrote webcodec.zip")
EOF
