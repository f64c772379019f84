#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/orc_haskell_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/orc_haskell_spark.zip", "w",
                     zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("orc_haskell_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            # .c kernel sources ship too: executors compile them on
            # first use (numpy fallback if the cluster has no cc)
            if f.endswith((".py", ".c")):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/orc_haskell_spark.zip")
EOF
