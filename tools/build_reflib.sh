#!/bin/sh
# Build the reference tree (scalar paths) as a test oracle shared lib in
# /tmp/refdsp.  Uses ABI-compatible ogg headers (tools/ogg_abi/) and
# links the distro libogg.  Test-fixture only; nothing links this at
# runtime.
set -e
REF=${VORBIS_REF:-/root/reference}
OUT=/tmp/refdsp
mkdir -p $OUT
cp -r "$(dirname "$0")/ogg_abi/ogg" $OUT/
touch $OUT/config.h
cd $OUT
SRCS="mdct.c smallft.c block.c envelope.c window.c lsp.c lpc.c analysis.c
synthesis.c psy.c info.c floor1.c floor0.c res0.c mapping0.c registry.c
codebook.c sharedbook.c lookup.c bitrate.c vorbisenc.c"
OBJS=""
for s in $SRCS; do
  gcc -O2 -fPIC -c -U__SSE__ -U__SSE2__ -U__SSE3__ -DHAVE_ALLOCA_H \
      -w -I. -I$REF/lib -I$REF/include -o ${s%.c}.o $REF/lib/$s
  OBJS="$OBJS ${s%.c}.o"
done
# -Bsymbolic: internal calls must bind internally (the distro libvorbis
# exports overlapping symbols and is loaded RTLD_GLOBAL by the oracle)
gcc -shared -Wl,-Bsymbolic -o libvorbisref.so $OBJS \
    /usr/lib/x86_64-linux-gnu/libogg.so.0 -lm
echo built $OUT/libvorbisref.so
# a non -Bsymbolic variant for the clean-subprocess golden encoder
gcc -shared -o libvorbisref_nosym.so $OBJS \
    /usr/lib/x86_64-linux-gnu/libogg.so.0 -lm
echo built $OUT/libvorbisref_nosym.so
