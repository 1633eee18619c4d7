// flightjax native host-I/O core.
//
// The reference consumes native capability through prebuilt C libraries
// (SDL2 via ccall for joysticks, NLopt for trim, HDF5 for tables — see
// SURVEY.md §2.4); its real-time pacing loop runs as compiled Julia
// (`sim.jl:541-553`). This module is the TPU build's equivalent native
// layer for the host side of the runtime:
//
//  - microsecond-accurate real-time pacing (coarse clock_nanosleep + spin
//    tail, off the GIL — Python's time.sleep has ~1-15 ms jitter, which is
//    visible at the 50 Hz simulation frame rate);
//  - the X-Plane 12 UDP packet codec (DREF / VEHS / CMND builders,
//    byte-compatible with `flightjax.io.network.xpmsg_*`, themselves
//    mirrors of `network.jl:160-196`);
//  - a batched UDP sender that emits a whole visualization frame (11
//    packets for the C172) with one call, so the Python output thread does
//    one FFI hop per frame instead of one syscall per packet.
//
// Built with plain g++ into _host_io.so (no external deps) and bound with
// ctypes; `flightjax.io.native` falls back to the pure-Python paths when
// the toolchain is unavailable.

#include <cstdint>
#include <cstring>
#include <ctime>

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

extern "C" {

// ------------------------------------------------------------------ pacing

// Monotonic clock in nanoseconds.
int64_t fj_now_ns() {
    timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return int64_t(ts.tv_sec) * 1000000000LL + ts.tv_nsec;
}

// Sleep until `target_ns` on CLOCK_MONOTONIC: coarse sleep until 200 us
// before the deadline, then spin. Returns signed overshoot in ns.
int64_t fj_pace_until(int64_t target_ns) {
    const int64_t spin_margin = 200 * 1000;  // 200 us
    int64_t now = fj_now_ns();
    if (target_ns - now > spin_margin) {
        timespec ts;
        int64_t coarse = target_ns - spin_margin;
        ts.tv_sec = coarse / 1000000000LL;
        ts.tv_nsec = coarse % 1000000000LL;
        clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME, &ts, nullptr);
    }
    while ((now = fj_now_ns()) < target_ns) {
        // spin tail
    }
    return now - target_ns;
}

// ------------------------------------------------------- X-Plane 12 codec

// DREF message: "DREF\0" + f32 little-endian + id + NUL padding to 509 B.
// Returns message length (always 509) or -1 if the id is too long.
int fj_xp_dref(uint8_t* out, const char* dref_id, float value) {
    size_t idlen = strlen(dref_id);
    if (idlen > 498) return -1;
    memcpy(out, "DREF\0", 5);
    memcpy(out + 5, &value, 4);  // host little-endian == wire format
    memcpy(out + 9, dref_id, idlen);
    memset(out + 9 + idlen, 0, 500 - idlen);
    return 509;
}

// VEHS pose message: "VEHS\0" + i32 aircraft + 3 x f64 + 3 x f32 = 49 B.
int fj_xp_vehs(uint8_t* out, int32_t aircraft, double lat_deg,
               double lon_deg, double h_m, float psi_deg, float theta_deg,
               float phi_deg) {
    memcpy(out, "VEHS\0", 5);
    memcpy(out + 5, &aircraft, 4);
    memcpy(out + 9, &lat_deg, 8);
    memcpy(out + 17, &lon_deg, 8);
    memcpy(out + 25, &h_m, 8);
    memcpy(out + 33, &psi_deg, 4);
    memcpy(out + 37, &theta_deg, 4);
    memcpy(out + 41, &phi_deg, 4);
    return 45;
}

// CMND message: "CMND\0" + id.
int fj_xp_cmnd(uint8_t* out, const char* cmd_id) {
    size_t idlen = strlen(cmd_id);
    memcpy(out, "CMND\0", 5);
    memcpy(out + 5, cmd_id, idlen);
    return int(5 + idlen);
}

// --------------------------------------------------------------- UDP send

// Open a UDP socket "connected" to address:port. Returns fd or -1.
int fj_udp_open(const char* address, int port) {
    int fd = socket(AF_INET, SOCK_DGRAM, 0);
    if (fd < 0) return -1;
    sockaddr_in sa;
    memset(&sa, 0, sizeof(sa));
    sa.sin_family = AF_INET;
    sa.sin_port = htons(uint16_t(port));
    if (inet_pton(AF_INET, address, &sa.sin_addr) != 1 ||
        connect(fd, reinterpret_cast<sockaddr*>(&sa), sizeof(sa)) != 0) {
        close(fd);
        return -1;
    }
    return fd;
}

// Send `n` packets from a contiguous buffer; `sizes[i]` is packet i's
// length. Returns number of packets sent.
int fj_udp_send_batch(int fd, const uint8_t* buf, const int32_t* sizes,
                      int n) {
    int sent = 0;
    size_t off = 0;
    for (int i = 0; i < n; ++i) {
        if (send(fd, buf + off, size_t(sizes[i]), 0) == ssize_t(sizes[i]))
            ++sent;
        off += size_t(sizes[i]);
    }
    return sent;
}

void fj_udp_close(int fd) { close(fd); }

}  // extern "C"
