package graft

import java.io.{BufferedReader, InputStreamReader}
import java.net.{InetAddress, InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

/** A minimal loopback FTP server — enough RFC 959 (USER/PASS/SYST/TYPE/
  * CWD/PASV/PORT/LIST/RETR/QUIT) for the ftp client that actually runs
  * in a Spark JVM. Spark's SharedState installs Hadoop's
  * `FsUrlStreamHandlerFactory` process-wide, so a `ftp:` URL opened via
  * `URL#openStream` resolves through Hadoop's `FTPFileSystem` (shaded
  * commons-net), which SYSTs for a listing parser, LISTs the parent
  * directory for `getFileStatus`, and RETRs over an ACTIVE (PORT) data
  * connection by default. Zero egress: control and data sockets only
  * ever touch the loopback address — the same real-sockets stance as
  * [[TestHttp]]. */
object TestFtp {

  /** Serve `files` (absolute path -> bytes) and invoke `f` with the
    * server's base url (`ftp://127.0.0.1:<port>`). */
  def withServer(files: Map[String, Array[Byte]])(f: String => Unit): Unit = {
    val loop = InetAddress.getLoopbackAddress
    val ctrl = new ServerSocket(0, 8, loop)
    @volatile var running = true
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val s = ctrl.accept()
          val worker = new Thread(() =>
            try serve(s, files, loop)
            catch { case _: Throwable => () }
            finally { try s.close() catch { case _: Throwable => () } })
          worker.setDaemon(true)
          worker.start()
        } catch { case _: Throwable => () /* closed on shutdown */ }
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    try f(s"ftp://${loop.getHostAddress}:${ctrl.getLocalPort}")
    finally { running = false; ctrl.close() }
  }

  private def parent(p: String): String = {
    val i = p.lastIndexOf('/')
    if (i <= 0) "/" else p.substring(0, i)
  }

  private def serve(s: Socket, files: Map[String, Array[Byte]],
      loop: InetAddress): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(s.getInputStream, StandardCharsets.ISO_8859_1))
    val out = s.getOutputStream
    def reply(line: String): Unit = {
      out.write((line + "\r\n").getBytes(StandardCharsets.ISO_8859_1))
      out.flush()
    }
    var cwd = "/"
    // data connection: passive = we accept; active (PORT) = we connect
    var passive: ServerSocket = null
    var active: InetSocketAddress = null
    def dataSocket(): Socket =
      if (passive != null) passive.accept()
      else { val d = new Socket(); d.connect(active); d }
    def withData(body: Socket => Unit): Unit = {
      reply("150 opening BINARY data connection")
      val d = dataSocket()
      try body(d) finally d.close()
      if (passive != null) { passive.close(); passive = null }
      active = null
      reply("226 transfer complete")
    }
    def resolve(arg: String): String = {
      val p =
        if (arg.startsWith("/")) arg
        else if (cwd.endsWith("/")) cwd + arg
        else cwd + "/" + arg
      if (p.length > 1 && p.endsWith("/")) p.dropRight(1) else p
    }
    def isDir(p: String): Boolean =
      p == "/" || files.keys.exists(_.startsWith(p + "/"))
    /** Unix-style listing line UnixFTPEntryParser accepts. */
    def entryLine(p: String): String = {
      val name = p.substring(p.lastIndexOf('/') + 1)
      if (isDir(p))
        f"drwxr-xr-x    2 ftp      ftp             0 Jan 01  2026 $name"
      else
        f"-rw-r--r--    1 ftp      ftp      ${files(p).length}%9d Jan 01  2026 $name"
    }
    def childrenOf(dir: String): Seq[String] = {
      val pre = if (dir == "/") "/" else dir + "/"
      (files.keys.filter(_.startsWith(pre))
        .map(k => pre + k.stripPrefix(pre).takeWhile(_ != '/')).toSet)
        .toSeq.sorted
    }
    reply("220 graft test ftp")
    var line = in.readLine()
    while (line != null) {
      val (cmd, arg) = line.split(" ", 2) match {
        case Array(c, a) => (c.toUpperCase, a)
        case Array(c)    => (c.toUpperCase, "")
      }
      cmd match {
        case "USER" => reply("331 need password")
        case "PASS" => reply("230 logged in")
        case "SYST" => reply("215 UNIX Type: L8")
        case "TYPE" | "NOOP" | "ALLO" => reply("200 ok")
        case "CWD" =>
          val p = resolve(arg)
          if (isDir(p)) { cwd = p; reply("250 ok") }
          else reply("550 not a directory")
        case "PWD" => reply(s"""257 "$cwd"""")
        case "EPSV" =>
          if (passive != null) passive.close()
          passive = new ServerSocket(0, 1, loop); active = null
          reply(s"229 Entering Extended Passive Mode (|||${passive.getLocalPort}|)")
        case "PASV" =>
          if (passive != null) passive.close()
          passive = new ServerSocket(0, 1, loop); active = null
          val p = passive.getLocalPort
          reply("227 Entering Passive Mode " +
            s"(${loop.getHostAddress.replace('.', ',')},${p / 256},${p % 256})")
        case "PORT" =>
          val n = arg.split(",").map(_.trim.toInt)
          active = new InetSocketAddress(
            InetAddress.getByName(n.take(4).mkString(".")), n(4) * 256 + n(5))
          if (passive != null) { passive.close(); passive = null }
          reply("200 PORT ok")
        case "SIZE" =>
          files.get(resolve(arg)) match {
            case Some(b) => reply(s"213 ${b.length}")
            case None    => reply("550 not found")
          }
        case "LIST" =>
          // commons-net passes "LIST <path>"; strip option flags like -a
          val target = resolve(arg.split(" ").filterNot(_.startsWith("-"))
            .lastOption.getOrElse(""))
          if (isDir(target)) withData { d =>
            val body = childrenOf(target).map(entryLine).mkString("", "\r\n", "\r\n")
            d.getOutputStream.write(body.getBytes(StandardCharsets.ISO_8859_1))
            d.getOutputStream.flush()
          }
          else if (files.contains(target)) withData { d =>
            d.getOutputStream.write(
              (entryLine(target) + "\r\n").getBytes(StandardCharsets.ISO_8859_1))
            d.getOutputStream.flush()
          }
          else reply("550 not found")
        case "RETR" =>
          files.get(resolve(arg)) match {
            case Some(bytes) if passive != null || active != null =>
              withData { d =>
                d.getOutputStream.write(bytes); d.getOutputStream.flush()
              }
            case Some(_) => reply("425 no data connection")
            case None    => reply("550 not found")
          }
        case "QUIT" => reply("221 bye"); return
        // MODE B (Hadoop's default transfer mode) and FEAT/OPTS: honest
        // "not implemented" — commons-net keeps STREAM mode on a 5xx and
        // Hadoop ignores the downgrade
        case _ => reply("502 not implemented")
      }
      line = in.readLine()
    }
  }
}
