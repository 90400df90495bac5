package graft.streaming

/** `otlp:`/`otap:` listen-URI parsing (reference src/otlp_uri.cpp;
  * goldens test/sql/uri.test). Default ports 4318 (otlp/http) and 4317
  * (otap/grpc); IPv6 hosts use brackets; an empty host means localhost;
  * hostnames containing the substring "otlp" survive scheme stripping. */
final case class OtlpUriParts(scheme: String, host: String, port: Int,
                              ipv6: Boolean, url: String) {
  /** Canonical registry key: scheme:host:port (ipv6 re-bracketed). */
  def canonical: String =
    if (ipv6) s"$scheme:[$host]:$port" else s"$scheme:$host:$port"
  def isLocalhost: Boolean =
    host == "localhost" || host == "127.0.0.1" || host == "::1"
}

object OtlpUri {
  def parse(uri: String): OtlpUriParts = {
    if (uri == null || uri.trim.isEmpty)
      throw new IllegalArgumentException("OTLP listen URI must not be empty")
    val (scheme, rest0) =
      if (uri.startsWith("otlp:")) ("otlp", uri.substring(5))
      else if (uri.startsWith("otap:")) ("otap", uri.substring(5))
      else throw new IllegalArgumentException(
        s"OTLP listen URI must use the otlp: or otap: scheme: $uri")
    val rest = if (rest0.startsWith("//")) rest0.substring(2) else rest0
    val defaultPort = if (scheme == "otlp") 4318 else 4317

    val (host, port, ipv6) =
      if (rest.isEmpty) ("localhost", defaultPort, false)
      else if (rest.startsWith("[")) {
        val close = rest.indexOf(']')
        if (close < 0)
          throw new IllegalArgumentException(s"unterminated IPv6 literal in $uri")
        val h = rest.substring(1, close)
        if (h.isEmpty)
          throw new IllegalArgumentException(s"empty IPv6 literal in $uri")
        val tail = rest.substring(close + 1)
        if (tail.isEmpty) (h, defaultPort, true)
        else if (tail.startsWith(":")) (h, parsePort(tail.substring(1), uri), true)
        else throw new IllegalArgumentException(s"invalid IPv6 URI: $uri")
      } else {
        val colon = rest.lastIndexOf(':')
        if (colon < 0) (rest, defaultPort, false)
        else (rest.substring(0, colon), parsePort(rest.substring(colon + 1), uri), false)
      }
    if (host.isEmpty)
      throw new IllegalArgumentException(s"empty host in OTLP listen URI: $uri")
    val url = if (ipv6) s"http://[$host]:$port" else s"http://$host:$port"
    OtlpUriParts(scheme, host, port, ipv6, url)
  }

  private def parsePort(s: String, uri: String): Int = {
    val p = s.toIntOption.getOrElse(
      throw new IllegalArgumentException(s"invalid port in OTLP listen URI: $uri"))
    if (p < 1 || p > 65535)
      throw new IllegalArgumentException(s"invalid port in OTLP listen URI: $uri")
    p
  }
}
