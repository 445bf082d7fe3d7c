#!/usr/bin/env sh
# Fetch the optional Java scorer toolchain (METEOR 1.5, SPICE 1.0, Stanford
# CoreNLP models) and print the env vars that activate the jar-backed scorers.
#
# Capability parity with the reference's eval/get_stanford_models.sh — the
# jars are authoritative when present; without them the framework's NATIVE
# scorers (evalcap/meteor_native.py, evalcap/spice_native.py, the native PTB
# tokenizer in evalcap/tokenizer.py) produce all five metrics offline, so this
# script is OPTIONAL and only needed to cross-check against the original Java
# implementations.
#
# Integrity: every download is sha256-verified against scripts/scorer_jars.sha256
# (the jars are EXECUTED by the scorers, so a tampered mirror would mean
# arbitrary code execution). The repo SHIPS NO PINS (the build environment has
# no network access to compute them), so by default the model is
# trust-on-first-use PER PIN FILE: the first fetch appends the observed
# checksum — verify it out-of-band against a trusted copy — and later fetches
# anywhere that share the pin file verify against it. Set
# SCORER_JARS_REQUIRE_PINS=1 to refuse any download without a pre-existing
# pin (CI / production posture).
#
# Layout produced (matches what the jars' manifests expect):
#   DEST/meteor-1.5.jar          + DEST/data/paraphrase-en.gz
#   DEST/spice-1.0.jar           + DEST/lib/*.jar (incl. CoreNLP core+models)
#   DEST/stanford-corenlp-3.6.0.jar (also kept top-level for CORENLP_JAR)
#
# Usage: scripts/get_scorer_jars.sh [DEST_DIR]   (default: ./scorer_jars)
set -e

DEST="${1:-scorer_jars}"
PINS="$(cd "$(dirname "$0")" && pwd -P)/scorer_jars.sha256"
mkdir -p "$DEST"
cd "$DEST"

# fetch_verified URL FILENAME — download + sha256-check against the pin file
fetch_verified() {
    url="$1"; out="$2"
    # exact-field filename match (no regex: '.' in jar names must not wildcard)
    pinned="$(awk -v f="$out" '$2 == f { print $1; exit }' "$PINS" 2>/dev/null || true)"
    if [ -z "$pinned" ] && [ -n "${SCORER_JARS_REQUIRE_PINS:-}" ]; then
        echo "No pin for $out in $PINS and SCORER_JARS_REQUIRE_PINS is set." >&2
        echo "Populate the pin file from a trusted fetch first." >&2
        exit 1
    fi
    wget -q "$url" -O "$out"
    sum="$(sha256sum "$out" | cut -d' ' -f1)"
    if [ -z "$pinned" ]; then
        echo "$sum  $out" >> "$PINS"
        echo "WARNING: no committed pin for $out — TRUST ON FIRST USE." >&2
        echo "PINNED: $sum  $out  (verify out-of-band before trusting)" >&2
    elif [ "$sum" != "$pinned" ]; then
        rm -f "$out"
        echo "CHECKSUM MISMATCH for $out: got $sum, pinned $pinned" >&2
        echo "Refusing to install a jar that does not match the pin." >&2
        exit 1
    fi
}

CORENLP=stanford-corenlp-full-2015-12-09
CORENLP_JAR=stanford-corenlp-3.6.0

if [ ! -f meteor-1.5.jar ]; then
    echo "Downloading METEOR 1.5..."
    fetch_verified \
        https://github.com/tylin/coco-caption/raw/master/pycocoevalcap/meteor/meteor-1.5.jar \
        meteor-1.5.jar
    # Meteor resolves its paraphrase table at data/paraphrase-en.gz relative
    # to the jar directory
    mkdir -p data
    fetch_verified \
        https://github.com/tylin/coco-caption/raw/master/pycocoevalcap/meteor/data/paraphrase-en.gz \
        paraphrase-en.gz
    mv paraphrase-en.gz data/paraphrase-en.gz
fi

if [ ! -f spice-1.0.jar ]; then
    echo "Downloading SPICE 1.0..."
    fetch_verified https://panderson.me/images/SPICE-1.0.zip SPICE-1.0.zip
    unzip -q SPICE-1.0.zip -d SPICE-tmp
    mv SPICE-tmp/SPICE-1.0/spice-1.0.jar .
    # spice-1.0.jar's manifest Class-Path points at lib/*.jar next to the jar
    mkdir -p lib
    mv SPICE-tmp/SPICE-1.0/lib/* lib/
    rm -rf SPICE-tmp SPICE-1.0.zip
fi

if [ ! -f "$CORENLP_JAR.jar" ]; then
    echo "Downloading Stanford CoreNLP (PTB tokenizer + SPICE models)..."
    fetch_verified "https://nlp.stanford.edu/software/$CORENLP.zip" "$CORENLP.zip"
    unzip -q "$CORENLP.zip" "$CORENLP/$CORENLP_JAR.jar" "$CORENLP/$CORENLP_JAR-models.jar" -d .
    mv "$CORENLP/$CORENLP_JAR.jar" "$CORENLP/$CORENLP_JAR-models.jar" .
    rm -rf "$CORENLP" "$CORENLP.zip"
    # SPICE loads the CoreNLP parser models through its lib/ classpath
    # (reference eval/get_stanford_models.sh does the same move)
    mkdir -p lib
    cp "$CORENLP_JAR.jar" "$CORENLP_JAR-models.jar" lib/
fi

HERE="$(pwd -P)"
echo "Done. To activate the jar-backed scorers:"
echo "  export METEOR_JAR=$HERE/meteor-1.5.jar"
echo "  export SPICE_JAR=$HERE/spice-1.0.jar"
echo "  export CORENLP_JAR=$HERE/$CORENLP_JAR.jar"
