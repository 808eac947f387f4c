// Native TCP render server — the C++ runtime front of the render service.
//
// Reference parity: src/render_server.cu:41-108 (sockpp accept loop; per
// connection: read 64 bytes = 16 float32 row-major camera-to-world pose,
// reply with W*H*3 raw RGB24). The reference embeds the renderer in the
// same process; here the TPU renderer is a worker subprocess (JAX owns
// the device), and this binary owns everything host-side: listening
// socket, accept loop, exact-framing reads/writes, client error
// containment, and worker lifecycle. Wire protocol is byte-identical.
//
// Usage:
//   render_server_native [port] -- <worker command...>
// The worker speaks on stdin/stdout: it first prints "READY <W> <H>\n",
// then loops { read 64-byte pose on stdin -> write W*H*3 bytes on stdout }.
// Default worker: python -m nerf_tpu.apps.render_worker (args forwarded).

#include <arpa/inet.h>
#include <csignal>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <netinet/in.h>
#include <string>
#include <sys/socket.h>
#include <sys/types.h>
#include <sys/wait.h>
#include <unistd.h>
#include <vector>

namespace {

constexpr size_t kPoseBytes = 64;  // 16 x float32 (render_server.cu:92)

bool read_exact(int fd, char* buf, size_t n) {
  size_t got = 0;
  while (got < n) {
    ssize_t r = read(fd, buf + got, n - got);
    if (r <= 0) return false;
    got += static_cast<size_t>(r);
  }
  return true;
}

bool write_exact(int fd, const char* buf, size_t n) {
  size_t put = 0;
  while (put < n) {
    ssize_t w = write(fd, buf + put, n - put);
    if (w <= 0) return false;
    put += static_cast<size_t>(w);
  }
  return true;
}

struct Worker {
  pid_t pid = -1;
  int to_worker = -1;    // we write poses here
  int from_worker = -1;  // we read frames here
  size_t frame_bytes = 0;
};

Worker spawn_worker(const std::vector<std::string>& cmd) {
  int in_pipe[2], out_pipe[2];
  if (pipe(in_pipe) || pipe(out_pipe)) {
    perror("pipe");
    exit(1);
  }
  pid_t pid = fork();
  if (pid < 0) {
    perror("fork");
    exit(1);
  }
  if (pid == 0) {  // child -> worker
    dup2(in_pipe[0], STDIN_FILENO);
    dup2(out_pipe[1], STDOUT_FILENO);
    close(in_pipe[0]);
    close(in_pipe[1]);
    close(out_pipe[0]);
    close(out_pipe[1]);
    std::vector<char*> argv;
    for (const auto& s : cmd) argv.push_back(const_cast<char*>(s.c_str()));
    argv.push_back(nullptr);
    execvp(argv[0], argv.data());
    perror("execvp");
    _exit(127);
  }
  close(in_pipe[0]);
  close(out_pipe[1]);

  Worker w;
  w.pid = pid;
  w.to_worker = in_pipe[1];
  w.from_worker = out_pipe[0];

  // handshake: "READY <W> <H>\n" (anything before it is worker chatter)
  std::string line;
  char c;
  int width = 0, height = 0;
  while (read(w.from_worker, &c, 1) == 1) {
    if (c == '\n') {
      if (sscanf(line.c_str(), "READY %d %d", &width, &height) == 2) break;
      line.clear();
    } else {
      line.push_back(c);
    }
  }
  if (width <= 0 || height <= 0) {
    fprintf(stderr, "[render_server_native] worker handshake failed\n");
    exit(1);
  }
  w.frame_bytes = static_cast<size_t>(width) * height * 3;
  fprintf(stderr, "[render_server_native] worker ready: %dx%d\n", width,
          height);
  return w;
}

}  // namespace

int main(int argc, char** argv) {
  signal(SIGPIPE, SIG_IGN);

  // port is argv[1] when numeric (reference: render_server.cu:47-55)
  int port = 12345;
  int argi = 1;
  int max_connections = -1;  // testing aid: exit after N connections
  if (argi < argc && argv[argi][0] != '-') port = atoi(argv[argi++]);
  if (argi < argc && std::string(argv[argi]) == "--max-connections") {
    max_connections = atoi(argv[argi + 1]);
    argi += 2;
  }

  std::vector<std::string> cmd;
  if (argi < argc && std::string(argv[argi]) == "--") {
    for (int i = argi + 1; i < argc; i++) cmd.push_back(argv[i]);
  } else {
    cmd = {"python", "-m", "nerf_tpu.apps.render_worker"};
    for (int i = argi; i < argc; i++) cmd.push_back(argv[i]);
  }

  Worker w = spawn_worker(cmd);
  std::vector<char> frame(w.frame_bytes);

  int srv = socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = INADDR_ANY;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (bind(srv, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    perror("bind");
    return 1;
  }
  listen(srv, 4);
  fprintf(stderr, "[render_server_native] listening on :%d\n", port);

  int served = 0;
  while (max_connections < 0 || served < max_connections) {
    int conn = accept(srv, nullptr, nullptr);
    if (conn < 0) continue;
    served++;
    fprintf(stderr, "[render_server_native] connection %d\n", served);
    char pose[kPoseBytes];
    while (read_exact(conn, pose, kPoseBytes)) {
      if (!write_exact(w.to_worker, pose, kPoseBytes)) {
        fprintf(stderr, "[render_server_native] worker died\n");
        close(conn);
        close(srv);
        return 1;
      }
      if (!read_exact(w.from_worker, frame.data(), frame.size())) {
        fprintf(stderr, "[render_server_native] worker EOF\n");
        close(conn);
        close(srv);
        return 1;
      }
      if (!write_exact(conn, frame.data(), frame.size())) break;  // client
    }
    close(conn);
  }
  close(srv);
  close(w.to_worker);
  int status = 0;
  waitpid(w.pid, &status, 0);
  return 0;
}
