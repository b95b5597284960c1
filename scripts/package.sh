#!/bin/sh
# Build the --py-files artifact for spark-submit.
set -e
cd "$(dirname "$0")/.."
rm -f kgspark.zip
python - <<'EOF'
import zipfile, pathlib
with zipfile.ZipFile("kgspark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(pathlib.Path("kgspark").glob("*.py")):
        z.write(p)
print("wrote kgspark.zip")
EOF
