"""Native host-I/O core: build, byte-parity with the Python codec, pacing
accuracy, batched UDP loopback."""

import socket
import time

import numpy as np
import pytest

from flightjax.io import native
from flightjax.io import network as net

pytestmark = [pytest.mark.fast, pytest.mark.skipif(
    not native.available(),
    reason=f"native core unavailable: {native.load_error()}")]


def test_dref_byte_parity():
    for dref, v in [("sim/flightmodel2/wing/elevator1_deg[8]", -3.25),
                    ("a", 0.0), ("x" * 498, 1e-9)]:
        assert native.xp_dref(dref, v) == net.xpmsg_set_dref(dref, v)
    with pytest.raises(ValueError):
        native.xp_dref("x" * 499, 0.0)


def test_vehs_byte_parity():
    a = native.xp_vehs(47.80433, 12.997, 429.0, 157.0, 3.7, -0.5)
    b = net.xpmsg_set_pose(47.80433, 12.997, 429.0, 157.0, 3.7, -0.5)
    assert a == b
    assert len(a) == 45


def test_cmnd_byte_parity():
    assert native.xp_cmnd("sim/operation/fix_all") == \
        net.xpmsg_cmd("sim/operation/fix_all")


def test_pacer_accuracy():
    # the pacer's spin tail lands within 200 us on an idle core, but the OS
    # can preempt the process mid-spin on a loaded box. Calibrate the
    # scheduler noise with plain sleeps and require the pacer to do no
    # worse than that (a real pacer regression fails in both conditions).
    import time
    noise = 0
    for _ in range(5):
        t0 = native.now_ns()
        time.sleep(0.005)
        noise = max(noise, native.now_ns() - t0 - 5_000_000)
    budget = max(200_000, 2 * noise)

    attempts = []
    for _ in range(3):
        t0 = native.now_ns()
        overshoots = []
        for k in range(1, 6):
            overshoots.append(native.pace_until(t0 + k * 5_000_000))
        elapsed = native.now_ns() - t0
        assert elapsed >= 25_000_000
        attempts.append(max(overshoots))
        if attempts[-1] < 200_000:
            break
    assert min(attempts) < budget, (attempts, budget)


def test_udp_batch_loopback():
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]

    tx = native.UdpBatchSender("127.0.0.1", port)
    packets = [native.xp_dref("sim/test[0]", 1.5),
               native.xp_vehs(1.0, 2.0, 3.0, 4.0, 5.0, 6.0),
               native.xp_cmnd("do/thing")]
    assert tx.send(packets) == 3
    got = [rx.recvfrom(65536)[0] for _ in range(3)]
    assert got == packets
    tx.close()
    rx.close()
