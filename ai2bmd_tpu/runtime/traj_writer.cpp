// Asynchronous trajectory writer (native runtime).
//
// Replaces the reference's deferred-side-effect machinery — the WorkQueue
// that postpones ASE trajectory writes into calculator idle windows
// (reference: src/utils/utils.py:66-105, 138-141) — with a real background
// writer: frames are copied into a ring buffer on submit and flushed to
// disk (CHARMM DCD and/or extended XYZ) by a dedicated thread, so the MD
// step loop never blocks on file IO.
//
// C ABI (used from Python via ctypes):
//   void* traj_open(const char* dcd_path, const char* xyz_path,
//                   int n_atoms, double timestep_fs, int save_interval,
//                   const char* symbols /* space-separated, for xyz */,
//                   const double* cell /* 3 orthorhombic box lengths, or
//                                         NULL for no unit-cell records */);
//   int   traj_write(void* h, const float* xyz, double energy, long step);
//   long  traj_pending(void* h);
//   void  traj_close(void* h);   // drains the queue, patches headers
//
// Build: g++ -O2 -shared -fPIC -o libtraj_writer.so traj_writer.cpp -lpthread

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<float> xyz;
  double energy;
  long step;
};

struct DcdFile {
  FILE* f = nullptr;
  int n_atoms = 0;
  int n_frames = 0;
  bool has_cell = false;
  double cell[3] = {0, 0, 0};  // orthorhombic box lengths (Angstrom)

  static void record(FILE* f, const void* payload, uint32_t n) {
    fwrite(&n, 4, 1, f);
    fwrite(payload, 1, n, f);
    fwrite(&n, 4, 1, f);
  }

  bool open(const char* path, int natoms, double timestep_fs, int interval,
            const double* box) {
    f = fopen(path, "wb");
    if (!f) return false;
    n_atoms = natoms;
    if (box) {
      has_cell = true;
      for (int i = 0; i < 3; ++i) cell[i] = box[i];
    }
    // header: "CORD" + 20 int control block
    char hdr[4 + 20 * 4];
    memcpy(hdr, "CORD", 4);
    int32_t icntrl[20] = {0};
    icntrl[2] = interval;
    float delta = static_cast<float>(timestep_fs * interval / 48.88821);
    memcpy(&icntrl[9], &delta, 4);
    icntrl[10] = has_cell ? 1 : 0;  // CHARMM unit-cell-per-frame flag
    icntrl[19] = 24;
    memcpy(hdr + 4, icntrl, 80);
    record(f, hdr, sizeof(hdr));
    char title[4 + 80];
    int32_t one = 1;
    memcpy(title, &one, 4);
    memset(title + 4, ' ', 80);
    memcpy(title + 4, "Created by ai2bmd-tpu native runtime", 36);
    record(f, title, sizeof(title));
    int32_t na = natoms;
    record(f, &na, 4);
    return true;
  }

  void write(const Frame& fr) {
    if (has_cell) {
      // CHARMM XTLABC: a, cos(gamma), b, cos(beta), cos(alpha), c
      double xtl[6] = {cell[0], 0.0, cell[1], 0.0, 0.0, cell[2]};
      record(f, xtl, sizeof(xtl));
    }
    std::vector<float> axis(n_atoms);
    for (int c = 0; c < 3; ++c) {
      for (int i = 0; i < n_atoms; ++i) axis[i] = fr.xyz[3 * i + c];
      record(f, axis.data(), n_atoms * 4);
    }
    ++n_frames;
  }

  void close() {
    if (!f) return;
    fflush(f);
    // patch frame counts at fixed offsets (marker + "CORD")
    fseek(f, 4 + 4, SEEK_SET);
    int32_t nf = n_frames;
    fwrite(&nf, 4, 1, f);
    fseek(f, 4 + 4 + 3 * 4, SEEK_SET);
    fwrite(&nf, 4, 1, f);
    fclose(f);
    f = nullptr;
  }
};

struct XyzFile {
  FILE* f = nullptr;
  std::vector<std::string> symbols;

  bool open(const char* path, const char* syms) {
    f = fopen(path, "w");
    if (!f) return false;
    std::istringstream ss(syms);
    std::string tok;
    while (ss >> tok) symbols.push_back(tok);
    return true;
  }

  void write(const Frame& fr) {
    fprintf(f, "%zu\nstep=%ld energy_eV=%.6f\n", symbols.size(), fr.step,
            fr.energy);
    for (size_t i = 0; i < symbols.size(); ++i) {
      fprintf(f, "%s %.6f %.6f %.6f\n", symbols[i].c_str(), fr.xyz[3 * i],
              fr.xyz[3 * i + 1], fr.xyz[3 * i + 2]);
    }
  }

  void close() {
    if (f) fclose(f);
    f = nullptr;
  }
};

struct Writer {
  DcdFile dcd;
  XyzFile xyz;
  bool has_dcd = false, has_xyz = false;
  int n_atoms = 0;

  std::deque<Frame> queue;
  std::mutex mu;
  std::condition_variable cv;
  bool closing = false;
  std::thread worker;

  void run() {
    for (;;) {
      Frame fr;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return closing || !queue.empty(); });
        if (queue.empty()) {
          if (closing) return;
          continue;
        }
        fr = std::move(queue.front());
        queue.pop_front();
      }
      if (has_dcd) dcd.write(fr);
      if (has_xyz) xyz.write(fr);
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* traj_open(const char* dcd_path, const char* xyz_path, int n_atoms,
                double timestep_fs, int save_interval, const char* symbols,
                const double* cell /* 3 box lengths or NULL */) {
  auto* w = new Writer();
  w->n_atoms = n_atoms;
  if (dcd_path && dcd_path[0]) {
    if (!w->dcd.open(dcd_path, n_atoms, timestep_fs, save_interval, cell)) {
      delete w;
      return nullptr;
    }
    w->has_dcd = true;
  }
  if (xyz_path && xyz_path[0]) {
    if (!w->xyz.open(xyz_path, symbols ? symbols : "")) {
      if (w->has_dcd) w->dcd.close();
      delete w;
      return nullptr;
    }
    w->has_xyz = true;
  }
  w->worker = std::thread([w] { w->run(); });
  return w;
}

int traj_write(void* h, const float* xyz, double energy, long step) {
  auto* w = static_cast<Writer*>(h);
  Frame fr;
  fr.xyz.assign(xyz, xyz + 3 * w->n_atoms);
  fr.energy = energy;
  fr.step = step;
  {
    std::lock_guard<std::mutex> lk(w->mu);
    if (w->closing) return -1;
    w->queue.push_back(std::move(fr));
  }
  w->cv.notify_all();
  return 0;
}

long traj_pending(void* h) {
  auto* w = static_cast<Writer*>(h);
  std::lock_guard<std::mutex> lk(w->mu);
  return static_cast<long>(w->queue.size());
}

void traj_close(void* h) {
  auto* w = static_cast<Writer*>(h);
  {
    std::lock_guard<std::mutex> lk(w->mu);
    w->closing = true;
  }
  w->cv.notify_all();
  w->worker.join();
  if (w->has_dcd) w->dcd.close();
  if (w->has_xyz) w->xyz.close();
  delete w;
}

}  // extern "C"
