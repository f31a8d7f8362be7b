package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test double: an `s3a://bucket/...`-schemed Hadoop FileSystem backed
  * by a local directory (`fs.graftstub.root`), so a lake table on an
  * object-store URI can stage/list/read data files in a spec without
  * hadoop-aws on the classpath. Deliberately provides NO atomic-rename
  * guarantee claim — [[ManifestLake.RenameCommit]] rejects the `s3a`
  * scheme regardless of what this backing store could do, which is
  * exactly the production posture the S3CommitSpec exercises: data IO
  * through the FileSystem, manifest publish ONLY through the
  * conditional-put HTTP primitive. Wired in via
  * `fs.s3a.impl = graft.sources.ObjectStoreStubFileSystem`. */
final class ObjectStoreStubFileSystem extends FileSystem {

  private var myUri: URI = _
  private var root: String = _
  private var local: FileSystem = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    myUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    root = conf.get("fs.graftstub.root")
    require(root != null, "set fs.graftstub.root to the stub's backing dir")
    local = FileSystem.getLocal(conf).getRaw
    workDir = new Path(myUri.toString + "/")
  }

  override def getUri: URI = myUri
  override def getScheme: String = myUri.getScheme

  private def toLocal(p: Path): Path = {
    val q = makeQualified(p)
    new Path(root + "/" + q.toUri.getAuthority + q.toUri.getPath)
  }

  private def fromLocal(p: Path): Path = {
    val prefix = new Path(root).toUri.getPath + "/" + myUri.getAuthority
    new Path(myUri.toString + p.toUri.getPath.stripPrefix(prefix))
  }

  private def translate(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      st.getPermission, st.getOwner, st.getGroup, fromLocal(st.getPath))

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    local.open(toLocal(f), bufferSize)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    local.create(toLocal(f), permission, overwrite, bufferSize, replication,
      blockSize, progress)

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    local.append(toLocal(f), bufferSize, progress)

  override def rename(src: Path, dst: Path): Boolean =
    local.rename(toLocal(src), toLocal(dst))

  override def delete(f: Path, recursive: Boolean): Boolean =
    local.delete(toLocal(f), recursive)

  override def listStatus(f: Path): Array[FileStatus] =
    local.listStatus(toLocal(f)).map(translate)

  override def setWorkingDirectory(dir: Path): Unit =
    workDir = makeQualified(dir)

  override def getWorkingDirectory: Path = workDir

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    local.mkdirs(toLocal(f), permission)

  override def getFileStatus(f: Path): FileStatus =
    translate(local.getFileStatus(toLocal(f)))
}
