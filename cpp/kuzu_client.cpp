// kuzu native inference client.
//
// Capability parity with the reference's C++/Rust example clients
// (yolov12/examples/YOLOv8-CPP-Inference, YOLOv8-ONNXRuntime-Rust, ...):
// feed an image to the detector, get boxes/scores/classes back, print or
// save them. The deployment shape differs TPU-side: the model runs in the
// kuzu serving process on the accelerator host; this client speaks the
// serve app's HTTP/JSON contract (kuzu/serve/app.py) over a raw POSIX
// socket — zero third-party dependencies.
//
// Build:  make -C cpp            (or: g++ -O2 -std=c++17 -o kuzu_client kuzu_client.cpp)
// Usage:  ./kuzu_client <host> <port> <image> [conf] [iou]

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Detection {
  double x1, y1, x2, y2, score;
  int cls;
};

std::string read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

int connect_to(const std::string& host, int port) {
  addrinfo hints{}, *res = nullptr;
  hints.ai_family = AF_INET;
  hints.ai_socktype = SOCK_STREAM;
  if (getaddrinfo(host.c_str(), std::to_string(port).c_str(), &hints, &res) != 0)
    throw std::runtime_error("resolve failed: " + host);
  int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (fd < 0 || connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
    freeaddrinfo(res);
    throw std::runtime_error("connect failed");
  }
  freeaddrinfo(res);
  return fd;
}

void send_all(int fd, const char* data, size_t n) {
  size_t off = 0;
  while (off < n) {
    ssize_t w = write(fd, data + off, n - off);
    if (w <= 0) throw std::runtime_error("write failed");
    off += static_cast<size_t>(w);
  }
}

std::string http_post(const std::string& host, int port, const std::string& path,
                      const std::string& body) {
  int fd = connect_to(host, port);
  std::ostringstream req;
  req << "POST " << path << " HTTP/1.1\r\n"
      << "Host: " << host << "\r\n"
      << "Content-Type: application/octet-stream\r\n"
      << "Accept: application/json\r\n"
      << "Content-Length: " << body.size() << "\r\n"
      << "Connection: close\r\n\r\n";
  const std::string header = req.str();
  send_all(fd, header.data(), header.size());
  send_all(fd, body.data(), body.size());

  std::string resp;
  char buf[16384];
  ssize_t r;
  while ((r = read(fd, buf, sizeof(buf))) > 0) resp.append(buf, static_cast<size_t>(r));
  close(fd);
  size_t sep = resp.find("\r\n\r\n");
  if (sep == std::string::npos) throw std::runtime_error("bad HTTP response");
  std::string status = resp.substr(0, resp.find("\r\n"));
  if (status.find("200") == std::string::npos)
    throw std::runtime_error("server error: " + status);
  return resp.substr(sep + 4);
}

// Tiny purpose-built JSON reader: extracts "boxes" (array of 4-arrays),
// "scores" and "classes" (flat arrays) from the serve app's response.
class JsonCursor {
 public:
  explicit JsonCursor(const std::string& s) : s_(s) {}

  bool seek_key(const std::string& key) {
    pos_ = s_.find("\"" + key + "\"");
    if (pos_ == std::string::npos) return false;
    pos_ = s_.find(':', pos_);
    return pos_ != std::string::npos;
  }

  std::vector<double> read_flat_array() {
    std::vector<double> out;
    size_t open = s_.find('[', pos_);
    size_t close = find_matching(open);
    std::string inner = s_.substr(open + 1, close - open - 1);
    std::istringstream ss(inner);
    std::string tok;
    while (std::getline(ss, tok, ',')) {
      try {
        out.push_back(std::stod(tok));
      } catch (...) {
      }
    }
    return out;
  }

  std::vector<std::vector<double>> read_nested_array() {
    std::vector<std::vector<double>> out;
    size_t open = s_.find('[', pos_);
    size_t close = find_matching(open);
    size_t p = open + 1;
    while (p < close) {
      size_t io = s_.find('[', p);
      if (io == std::string::npos || io >= close) break;
      size_t ic = find_matching(io);
      std::string inner = s_.substr(io + 1, ic - io - 1);
      std::vector<double> row;
      std::istringstream ss(inner);
      std::string tok;
      while (std::getline(ss, tok, ',')) {
        try {
          row.push_back(std::stod(tok));
        } catch (...) {
        }
      }
      out.push_back(row);
      p = ic + 1;
    }
    return out;
  }

 private:
  size_t find_matching(size_t open) const {
    int depth = 0;
    for (size_t i = open; i < s_.size(); ++i) {
      if (s_[i] == '[') ++depth;
      if (s_[i] == ']' && --depth == 0) return i;
    }
    return s_.size();
  }

  const std::string& s_;
  size_t pos_ = 0;
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::cerr << "usage: " << argv[0]
              << " <host> <port> <image> [conf=0.25] [iou=0.45]\n";
    return 2;
  }
  const std::string host = argv[1];
  const int port = std::stoi(argv[2]);
  const std::string image_path = argv[3];
  const std::string conf = argc > 4 ? argv[4] : "0.25";
  const std::string iou = argc > 5 ? argv[5] : "0.45";

  try {
    const std::string body = read_file(image_path);
    const std::string path = "/predict?conf=" + conf + "&iou=" + iou;
    const std::string json = http_post(host, port, path, body);

    JsonCursor boxes_cur(json);
    if (!boxes_cur.seek_key("boxes")) throw std::runtime_error("no boxes in response");
    auto boxes = boxes_cur.read_nested_array();
    JsonCursor scores_cur(json);
    scores_cur.seek_key("scores");
    auto scores = scores_cur.read_flat_array();
    JsonCursor cls_cur(json);
    cls_cur.seek_key("classes");
    auto classes = cls_cur.read_flat_array();

    std::printf("%zu detections\n", boxes.size());
    for (size_t i = 0; i < boxes.size(); ++i) {
      const auto& b = boxes[i];
      if (b.size() < 4) continue;
      double s = i < scores.size() ? scores[i] : 0.0;
      int c = i < classes.size() ? static_cast<int>(classes[i]) : 0;
      std::printf("cls=%d score=%.4f box=[%.1f, %.1f, %.1f, %.1f]\n", c, s,
                  b[0], b[1], b[2], b[3]);
    }
  } catch (const std::exception& e) {
    std::cerr << "error: " << e.what() << "\n";
    return 1;
  }
  return 0;
}
