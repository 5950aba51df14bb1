"""Minimal tfevents scalar reader (no tensorflow import)."""
import glob, struct, sys


def read_scalars(path):
    out = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            (length,) = struct.unpack("<Q", hdr)
            f.read(4)  # len crc
            data = f.read(length)
            f.read(4)  # data crc
            # crude proto scan: find step (field 3 varint? no -- field 2
            # wall_time double, field 3 step int64, summary field 5)
            out.append(data)
    return out


def parse_events(path):
    """Yield (step, tag, value) from a tfevents file."""
    import re
    for data in read_scalars(path):
        # Event: field1 wall_time(double) field2 step(int64) field5 summary
        step = 0
        i = 0
        tag = None
        val = None
        # very small hand-rolled proto walk
        def varint(b, i):
            r = 0; s = 0
            while True:
                x = b[i]; i += 1
                r |= (x & 0x7F) << s
                if not x & 0x80:
                    return r, i
                s += 7
        while i < len(data):
            key, i = varint(data, i)
            f, w = key >> 3, key & 7
            if w == 0:
                v, i = varint(data, i)
                if f == 2:
                    step = v
            elif w == 1:
                i += 8
            elif w == 5:
                i += 4
            elif w == 2:
                ln, i = varint(data, i)
                sub = data[i:i + ln]; i += ln
                if f == 5:  # summary
                    j = 0
                    while j < len(sub):
                        k2, j = varint(sub, j)
                        f2, w2 = k2 >> 3, k2 & 7
                        if w2 == 2:
                            l2, j = varint(sub, j)
                            s2 = sub[j:j + l2]; j += l2
                            if f2 == 1:  # value entry
                                jj = 0
                                while jj < len(s2):
                                    k3, jj = varint(s2, jj)
                                    f3, w3 = k3 >> 3, k3 & 7
                                    if w3 == 2:
                                        l3, jj = varint(s2, jj)
                                        if f3 == 1:
                                            tag = s2[jj:jj + l3].decode()
                                        jj += l3
                                    elif w3 == 5:
                                        if f3 == 2:
                                            val = struct.unpack(
                                                "<f", s2[jj:jj + 4])[0]
                                        jj += 4
                                    elif w3 == 1:
                                        jj += 8
                                    elif w3 == 0:
                                        _, jj = varint(s2, jj)
                        elif w2 == 0:
                            _, j = varint(sub, j)
        if tag is not None and val is not None:
            yield step, tag, val


if __name__ == "__main__":
    pat = sys.argv[1]
    last = {}
    n = {}
    for p in sorted(glob.glob(pat, recursive=True)):
        for step, tag, val in parse_events(p):
            last[tag] = (step, val)
            n[tag] = n.get(tag, 0) + 1
    for tag, (step, val) in sorted(last.items()):
        print(f"{tag}: step {step} value {val:.4f} (n={n[tag]})")
