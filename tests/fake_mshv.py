"""Reference-faithful fake ``sdrpp_ft8_mshv`` for contract tests.

Implements the exact argv/file framing of the real decoder binary
(reference ft8_decoder.h:196-212):

    fake_mshv.py <outPath> --decode <wavPath> --mode <FT8|FT4>
                 --threads <n>

Reads the WAV, finds the strongest tone, and writes tab-separated
FT8_OUT lines PROGRESSIVELY (to exercise the caller's polling loop),
then DECODE_EOF.  The decoded "message" embeds the detected tone
frequency so the test can assert the audio actually flowed through.
"""

import sys
import time

import numpy as np


def main():
    out_path = sys.argv[1]
    assert sys.argv[2] == "--decode", sys.argv
    wav_path = sys.argv[3]
    assert sys.argv[4] == "--mode", sys.argv
    mode = sys.argv[5]
    assert sys.argv[6] == "--threads", sys.argv
    int(sys.argv[7])

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from sdrplusplusbrown_tpu.io.wav import read_wav_iq
    y, rate = read_wav_iq(wav_path)
    mono = np.real(y)
    X = np.abs(np.fft.rfft(mono * np.hanning(len(mono))))
    peak_hz = float(np.argmax(X) * rate / len(mono))
    snr = -12
    now_ms = int(time.time() * 1000)
    tag = f"{mode}_OUT"

    def line(freq, msg):
        return (f"{tag}\t{now_ms}\t30\t{{0}}\t120000\t{{1}}\t{snr}\t"
                f"{{2}}\t0.2\t{{3}}\t{freq:.0f}\t{{4}}\t{msg}\t{{5}}\t"
                f"? 0\t{{6}}\t0.1\t{{7}}\t{freq:.0f}\n")

    with open(out_path, "w") as f:
        f.write(line(peak_hz, f"CQ TEST K1ABC FN42 T{peak_hz:.0f}"))
        f.flush()
        time.sleep(0.3)       # caller must pick up partial results
        f.write(line(peak_hz + 60, "K1ABC W9XYZ -07"))
        f.write("garbage line that must be ignored\n")
        f.flush()
        time.sleep(0.2)
        f.write("DECODE_EOF\n")


if __name__ == "__main__":
    main()
