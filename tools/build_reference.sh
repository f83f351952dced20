#!/bin/bash
# Build the reference graphd binary out-of-tree for differential
# testing (tests/test_differential.py).  Compiles the public C sources
# under $REF (default /root/reference) into $OUT (default
# /tmp/graphd_ref_build) without touching the reference checkout.
#
# The binary is a TEST ORACLE only — the engine never links against or
# ships any of this code.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/graphd_ref_build}
CFLAGS="-O1 -w -fcommon -I$REF -D_GNU_SOURCE"

# dead files (not in the BUILD source lists) and standalone tool mains
SKIP="libsrv/srv.c graphd/graphd-backend.c graphd/graphd-primitive-dump.c \
graphd/graphd-result-token.c libaddb/addb.c libaddb/addbspec.c \
libcm/cm-test.c libgraph/graphdateline.c libgraph/graphdbid.c \
libgraph/graphgrmap.c libgraph/graphguid.c libgraph/graphhullset.c \
libgraph/graphtimestamp.c libgraphdb/demo-poll.c \
libgraphdb/graphdb-to-dot.c libpdb/pdbdump.c libsrv/srv-main.c"

mkdir -p "$OUT/obj"
for d in libcm libcl libes libgdp libgraph libaddb libpdb libsrv \
         libgraphdb graphd; do
  for f in "$REF"/$d/*.c; do
    rel="$d/$(basename "$f")"
    case " $SKIP " in *" $rel "*) continue ;; esac
    o="$OUT/obj/${d}_$(basename "$f" .c).o"
    [ -f "$o" ] && continue
    gcc $CFLAGS -c "$f" -o "$o"
  done
done

# srv-main.c declares sched_setaffinity with a pre-glibc prototype;
# patch a copy instead of the checkout
sed -e 's/^extern int sched_setaffinity.*$/\/* glibc declares sched_setaffinity *\//' \
    -e 's/sched_setaffinity( 0, sizeof mask, \&mask )/sched_setaffinity( 0, sizeof mask, (void *)\&mask )/' \
    "$REF/libsrv/srv-main.c" > "$OUT/srv-main-patched.c"
gcc $CFLAGS -I"$REF/libsrv" -c "$OUT/srv-main-patched.c" \
    -o "$OUT/obj/libsrv_srv-main.o"

gcc "$OUT"/obj/*.o -o "$OUT/graphd" -lm -lpthread
echo "built $OUT/graphd"
