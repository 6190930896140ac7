// dataload — native training-batch assembly (the data-loader runtime).
//
// Counterpart of the reference's multi-worker torch DataLoaders
// (CNO_timeModule_CIN.py dataloaders with num_workers=6;
// Autoregressive_Baseline_Scripts/utils/data_loader.py): assembling a
// time-pair training batch = gather (traj, t1) input frames and (traj, t2)
// label frames from the (N,T,H,W,C) contract tensor, z-score the physical
// channels, and append the lead-time channel. Here that whole per-batch
// pipeline is ONE multithreaded C routine over a borrowed (zero-copy) numpy
// buffer, plus a background worker so the next batch assembles while Python
// feeds the TPU the current one. No GIL on the assembly path.
//
// C ABI only — bound via ctypes (no pybind11 in this environment).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Loader {
  const float* data;  // borrowed (N,T,H,W,C) contiguous buffer
  int64_t N, T, H, W, C;

  // async double-buffer state
  std::thread worker;
  std::mutex m;
  std::condition_variable cv_work, cv_done;
  // protocol: submit -> wait -> submit ... ; `busy` covers the window where
  // the worker has snapshotted the job but not yet posted the result, so a
  // premature second submit is rejected instead of silently reordered
  bool has_job = false, busy = false, has_result = false, closing = false;

  // pending job
  std::vector<int64_t> traj, t1, t2;
  std::vector<float> tval;
  std::vector<float> mean, stdv;
  int64_t oc = 0;
  int time_input = 0;

  // result buffers
  std::vector<float> inp_buf, lab_buf;
  int64_t out_n = 0;
};

void gather_range(const Loader* L, int64_t k0, int64_t k1,
                  const int64_t* traj, const int64_t* t1, const int64_t* t2,
                  const float* tval, const float* mean, const float* stdv,
                  int64_t oc, int time_input, float* inp_out, float* lab_out) {
  const int64_t HW = L->H * L->W;
  const int64_t C = L->C;
  const int64_t ci = C + (time_input ? 1 : 0);
  std::vector<float> inv_std(oc);
  for (int64_t c = 0; c < oc; ++c) inv_std[c] = 1.0f / stdv[c];
  for (int64_t k = k0; k < k1; ++k) {
    const float* in_src = L->data + ((traj[k] * L->T + t1[k]) * HW * C);
    const float* lab_src = L->data + ((traj[k] * L->T + t2[k]) * HW * C);
    float* ip = inp_out + k * HW * ci;
    float* lp = lab_out + k * HW * oc;
    const float tv = tval[k];
    for (int64_t p = 0; p < HW; ++p) {
      const float* s = in_src + p * C;
      float* d = ip + p * ci;
      for (int64_t c = 0; c < oc; ++c) d[c] = (s[c] - mean[c]) * inv_std[c];
      for (int64_t c = oc; c < C; ++c) d[c] = s[c];
      if (time_input) d[C] = tv;
      const float* sl = lab_src + p * C;
      float* dl = lp + p * oc;
      for (int64_t c = 0; c < oc; ++c) dl[c] = (sl[c] - mean[c]) * inv_std[c];
    }
  }
}

void gather_threaded(const Loader* L, int64_t n, const int64_t* traj,
                     const int64_t* t1, const int64_t* t2, const float* tval,
                     const float* mean, const float* stdv, int64_t oc,
                     int time_input, float* inp_out, float* lab_out,
                     int n_threads) {
  if (n_threads <= 1 || n < 2 * n_threads) {
    gather_range(L, 0, n, traj, t1, t2, tval, mean, stdv, oc, time_input,
                 inp_out, lab_out);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int i = 0; i < n_threads; ++i) {
    int64_t k0 = i * chunk, k1 = std::min<int64_t>(n, k0 + chunk);
    if (k0 >= k1) break;
    ts.emplace_back(gather_range, L, k0, k1, traj, t1, t2, tval, mean, stdv,
                    oc, time_input, inp_out, lab_out);
  }
  for (auto& t : ts) t.join();
}

void worker_loop(Loader* L) {
  for (;;) {
    std::unique_lock<std::mutex> lk(L->m);
    L->cv_work.wait(lk, [&] { return L->has_job || L->closing; });
    if (L->closing) return;
    // snapshot the job under the lock, assemble without it
    auto traj = L->traj; auto t1 = L->t1; auto t2 = L->t2;
    auto tval = L->tval; auto mean = L->mean; auto stdv = L->stdv;
    int64_t oc = L->oc;
    int ti = L->time_input;
    L->has_job = false;
    L->busy = true;
    int64_t n = static_cast<int64_t>(traj.size());
    const int64_t ci = L->C + (ti ? 1 : 0);
    L->inp_buf.resize(n * L->H * L->W * ci);
    L->lab_buf.resize(n * L->H * L->W * oc);
    lk.unlock();
    gather_threaded(L, n, traj.data(), t1.data(), t2.data(), tval.data(),
                    mean.data(), stdv.data(), oc, ti,
                    L->inp_buf.data(), L->lab_buf.data(), 2);
    lk.lock();
    L->out_n = n;
    L->busy = false;
    L->has_result = true;
    L->cv_done.notify_all();
  }
}

}  // namespace

extern "C" {

void* tp_loader_create(const float* data, int64_t N, int64_t T, int64_t H,
                       int64_t W, int64_t C) {
  auto* L = new Loader();
  L->data = data;
  L->N = N; L->T = T; L->H = H; L->W = W; L->C = C;
  L->worker = std::thread(worker_loop, L);
  return L;
}

// Synchronous multithreaded batch assembly.
int tp_gather(void* handle, int64_t n, const int64_t* traj, const int64_t* t1,
              const int64_t* t2, const float* tval, const float* mean,
              const float* stdv, int64_t oc, int time_input, float* inp_out,
              float* lab_out, int n_threads) {
  auto* L = static_cast<Loader*>(handle);
  if (oc < 0 || oc > L->C) return -3;  // mean/std wider than the channels
  for (int64_t k = 0; k < n; ++k)
    if (traj[k] < 0 || traj[k] >= L->N || t1[k] < 0 || t1[k] >= L->T ||
        t2[k] < 0 || t2[k] >= L->T)
      return -1;
  gather_threaded(L, n, traj, t1, t2, tval, mean, stdv, oc, time_input,
                  inp_out, lab_out, n_threads);
  return 0;
}

// Hand the next batch's indices to the background worker (non-blocking wrt
// assembly; blocks only if a previous un-collected result is pending).
int tp_submit(void* handle, int64_t n, const int64_t* traj, const int64_t* t1,
              const int64_t* t2, const float* tval, const float* mean,
              const float* stdv, int64_t oc, int time_input) {
  auto* L = static_cast<Loader*>(handle);
  if (oc < 0 || oc > L->C) return -3;  // mean/std wider than the channels
  for (int64_t k = 0; k < n; ++k)
    if (traj[k] < 0 || traj[k] >= L->N || t1[k] < 0 || t1[k] >= L->T ||
        t2[k] < 0 || t2[k] >= L->T)
      return -1;
  std::unique_lock<std::mutex> lk(L->m);
  if (L->has_job || L->busy || L->has_result)
    return -2;  // protocol: submit → wait → submit
  L->traj.assign(traj, traj + n);
  L->t1.assign(t1, t1 + n);
  L->t2.assign(t2, t2 + n);
  L->tval.assign(tval, tval + n);
  L->mean.assign(mean, mean + oc);
  L->stdv.assign(stdv, stdv + oc);
  L->oc = oc;
  L->time_input = time_input;
  L->has_job = true;
  L->has_result = false;
  L->cv_work.notify_one();
  return 0;
}

// Block until the submitted batch is assembled; copy into caller buffers.
// Returns the batch size, or negative on protocol error.
int64_t tp_wait(void* handle, float* inp_out, float* lab_out) {
  auto* L = static_cast<Loader*>(handle);
  std::unique_lock<std::mutex> lk(L->m);
  L->cv_done.wait(lk, [&] { return L->has_result; });
  std::memcpy(inp_out, L->inp_buf.data(), L->inp_buf.size() * sizeof(float));
  std::memcpy(lab_out, L->lab_buf.data(), L->lab_buf.size() * sizeof(float));
  L->has_result = false;
  return L->out_n;
}

void tp_loader_close(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  {
    std::unique_lock<std::mutex> lk(L->m);
    L->closing = true;
  }
  L->cv_work.notify_all();
  L->worker.join();
  delete L;
}

}  // extern "C"
