package graft.api

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.sources.SidecarIO

/** RBAC — users, roles, privileges, and the request-time permission
  * check (reference: internal/entity/user.go, internal/master/services/
  * user_service.go + role_service.go, enforced by the BasicAuth
  * middleware at internal/master/cluster_api.go:101-160 and
  * internal/router/document/doc_http.go:69-123).
  *
  * The reference keeps users/roles as JSON values in etcd under
  * per-name keys, guarded by etcd locks + STM; here they are JSON
  * sidecars under `<catalogRoot>/_rbac/{users,roles}/<name>.json`,
  * written atomically (tmp + rename, [[SidecarIO.writeString]]) and
  * guarded by the same single-admin-driver rule as the rest of the
  * catalog (instance-level `synchronized` replaces the etcd lock; admin
  * mutations are driver-side metadata ops, never on a query hot path).
  *
  * Semantics mirrored 1:1 from the reference:
  *  - name validation (user.go:164-189): non-empty, no leading digit or
  *    `_`, the reference's forbidden-rune list, and `root` reserved.
  *  - six built-in roles (user.go:141-155) resolve from the static map
  *    before storage (role_service.go:104-107), so they can be neither
  *    shadowed nor deleted.
  *  - user CRUD (user_service.go): role must exist and password must be
  *    present at create; `root` cannot be deleted; update is role XOR
  *    password (user_service.go:192-225) with the old-password check and
  *    the same-password rejection, and the root user may reset another
  *    user's password without knowing the old one.
  *  - grant/revoke privilege merge (role_service.go:210-228).
  *  - endpoint→(resource, privilege) parsing (user.go:191-269),
  *    including the document-verb special case (query/search read,
  *    everything else write).
  *
  * ONE deliberate divergence, documented: the reference's
  * `HasPermissionForResources` (user.go:300-313) denies only when the
  * resource key is ABSENT from the role — a present-but-insufficient
  * privilege (e.g. `ReadOnly` against a write, or even `None`) falls
  * through to `return nil` and ADMITS the request. Here the decision
  * table is strict: `WriteRead` admits both verbs, `ReadOnly`/`WriteOnly`
  * admit exactly their verb, `None` and absence deny, and a
  * `ResourceAll` grant applies to every resource (the shape the built-in
  * root role declares, user.go:90-92 — reachable in the reference only
  * via the root-NAME bypass). Same posture as the engine's `sort` spec:
  * where the reference's check is dead or permissive by accident, the
  * engine implements the declared semantics.
  */
object Rbac {

  // privileges (user.go:29-41)
  val PrivNone = "None"
  val PrivWriteOnly = "WriteOnly"
  val PrivReadOnly = "ReadOnly"
  val PrivWriteRead = "WriteRead"
  val Privileges: Set[String] =
    Set(PrivNone, PrivWriteOnly, PrivReadOnly, PrivWriteRead)

  // resources (user.go:45-75)
  val Resources: Set[String] = Set(
    "ResourceAll", "ResourceCluster", "ResourceServer", "ResourcePartition",
    "ResourceDB", "ResourceSpace", "ResourceDocument", "ResourceIndex",
    "ResourceAlias", "ResourceUser", "ResourceRole", "ResourceConfig",
    "ResourceCache")

  val OpGrant = "Grant"
  val OpRevoke = "Revoke"

  val RootName = "root"

  /** user.go:84-88 — `operator` rides the change-privilege request. */
  final case class Role(
      name: String,
      privileges: Map[String, String] = Map.empty,
      operator: Option[String] = None) {

    /** Role.Validate (user.go:271-296). */
    def validate(): Unit = {
      validateName(name, "Role", checkRoot = true)
      operator.foreach { op =>
        if (op != OpGrant && op != OpRevoke) throw new IllegalArgumentException(
          s"role privilege operator type : $op, should be $OpGrant or $OpRevoke")
      }
      privileges.foreach { case (resource, privilege) =>
        if (!Resources.contains(resource)) throw new IllegalArgumentException(
          s"role resource: $resource, should be ${Resources.mkString("[", " ", "]")}")
        if (!Privileges.contains(privilege)) throw new IllegalArgumentException(
          s"role privilege: $privilege, should be ${Privileges.mkString("[", " ", "]")}")
      }
    }

    /** Strict decision table over the parsed (resource, verb) — see the
      * class doc for the one divergence from user.go:300-313.
      */
    def hasPermission(endpoint: String, method: String): Boolean = {
      if (name == RootName) return true
      val (resource, want) = parseResources(endpoint, method)
      def admits(have: String): Boolean =
        have == PrivWriteRead || have == want
      privileges.get(resource).exists(admits) ||
        privileges.get("ResourceAll").exists(admits)
    }
  }

  /** user.go:315-320. */
  final case class User(
      name: String,
      password: Option[String] = None,
      oldPassword: Option[String] = None,
      roleName: Option[String] = None) {

    /** User.Validate (user.go:329-345). */
    def validate(checkRoot: Boolean): Unit = {
      validateName(name, "User", checkRoot)
      if (password.contains("")) throw new IllegalArgumentException(
        "user password is empty")
      if (checkRoot && roleName.exists(_.equalsIgnoreCase(RootName)))
        throw new IllegalArgumentException("user role name can't be root")
    }
  }

  /** QueryUser's response shape (user.go:322-327): name + resolved role,
    * password only on the with-password lookup the auth path uses.
    */
  final case class UserRole(
      name: String,
      role: Role,
      password: Option[String] = None)

  // built-in roles (user.go:90-155): resolved before storage, immutable
  private val wr = PrivWriteRead
  private val ro = PrivReadOnly
  val RootRole = Role(RootName, Map("ResourceAll" -> wr))
  val RoleMap: Map[String, Role] = Map(
    RootName -> RootRole,
    "defaultClusterAdmin" -> Role("defaultClusterAdmin", Map(
      "ResourceCluster" -> wr, "ResourceServer" -> wr,
      "ResourcePartition" -> wr, "ResourceDB" -> wr, "ResourceSpace" -> wr,
      "ResourceDocument" -> wr, "ResourceIndex" -> wr, "ResourceAlias" -> wr,
      "ResourceConfig" -> wr, "ResourceUser" -> wr, "ResourceRole" -> wr)),
    "defaultSpaceAdmin" -> Role("defaultSpaceAdmin", Map(
      "ResourceSpace" -> wr, "ResourceDocument" -> wr,
      "ResourceIndex" -> wr, "ResourceAlias" -> ro)),
    "defaultDocumentAdmin" -> Role("defaultDocumentAdmin", Map(
      "ResourceDocument" -> wr, "ResourceIndex" -> wr)),
    "defaultReadDBSpaceEditDocument" -> Role("defaultReadDBSpaceEditDocument",
      Map("ResourceCluster" -> ro, "ResourceDB" -> ro, "ResourceSpace" -> ro,
        "ResourceDocument" -> wr, "ResourceIndex" -> wr,
        "ResourceAlias" -> ro)),
    "defaultReadSpaceEditDocument" -> Role("defaultReadSpaceEditDocument",
      Map("ResourceSpace" -> ro, "ResourceDocument" -> wr,
        "ResourceIndex" -> wr, "ResourceAlias" -> ro)))

  // ValidateName's forbidden-rune list (user.go:176-181)
  private val forbidden: Set[Char] = Set(
    '\t', '\n', '\u000B', '\f', '\r', ' ', '\u0085', '\u00A0', '\\', '+',
    '-', '!', '*', '/', '(', ')', ':', '^', '[', ']', '"', '{', '}', '~',
    '%', '&', '\'', '<', '>', '?')

  /** ValidateName (user.go:164-189). */
  def validateName(name: String, nameType: String, checkRoot: Boolean): Unit = {
    if (name.isEmpty) throw new IllegalArgumentException(
      s"$nameType name can not be empty string")
    if (name.head.isDigit) throw new IllegalArgumentException(
      s"$nameType name : $name can not start with num")
    if (name.head == '_') throw new IllegalArgumentException(
      s"$nameType name : $name can not start with _")
    name.find(forbidden.contains).foreach { c =>
      throw new IllegalArgumentException(
        s"character '$c' can not in $nameType name[$name]")
    }
    if (checkRoot && name.equalsIgnoreCase(RootName))
      throw new IllegalArgumentException(s"$nameType name can't be root")
  }

  /** ParseResources (user.go:191-269): endpoint prefix → resource,
    * method → verb; document endpoints read iff the verb path contains
    * `query` or `search`, write otherwise.
    */
  def parseResources(endpoint: String, method: String): (String, String) = {
    val base = if (method == "GET") PrivReadOnly else PrivWriteOnly
    def has(p: String) = endpoint.startsWith(p)
    if (has("/cluster")) ("ResourceCluster", base)
    else if (has("/servers")) ("ResourceServer", base)
    else if (has("/partitions")) ("ResourcePartition", base)
    else if (has("/dbs"))
      (if (endpoint.contains("/spaces")) "ResourceSpace" else "ResourceDB", base)
    else if (has("/backup")) ("ResourceSpace", base)
    else if (has("/document"))
      ("ResourceDocument",
        if (endpoint.contains("query") || endpoint.contains("search"))
          PrivReadOnly
        else PrivWriteOnly)
    else if (has("/index")) ("ResourceIndex", base)
    else if (has("/alias")) ("ResourceAlias", base)
    else if (has("/config")) ("ResourceConfig", base)
    else if (has("/users")) ("ResourceUser", base)
    else if (has("/roles")) ("ResourceRole", base)
    else if (has("/cache")) ("ResourceCache", base)
    else ("ResourceAll", base)
  }

  // ── JSON wire forms (vjson-marshalled entity structs) ──

  private def str(j: JValue): Option[String] = j match {
    case JString(s) => Some(s)
    case _ => None
  }

  private[api] def userToJson(u: User): String = {
    val fields = List("name" -> JString(u.name)) ++
      u.password.map(p => "password" -> (JString(p): JValue)) ++
      u.roleName.map(r => "role_name" -> (JString(r): JValue))
    JsonMethods.compact(JsonMethods.render(JObject(fields: _*)))
  }

  private[api] def userFromJson(s: String): User = {
    val j = JsonMethods.parse(s)
    User(
      name = str(j \ "name").getOrElse(
        throw new IllegalArgumentException("user json missing name")),
      password = str(j \ "password"),
      roleName = str(j \ "role_name"))
  }

  private[api] def roleToJson(r: Role): String = {
    val privs = JObject(r.privileges.toList.sortBy(_._1)
      .map { case (k, v) => k -> (JString(v): JValue) }: _*)
    JsonMethods.compact(JsonMethods.render(
      JObject("name" -> JString(r.name), "privileges" -> privs)))
  }

  private[api] def roleFromJson(s: String): Role = {
    val j = JsonMethods.parse(s)
    val privs = (j \ "privileges") match {
      case JObject(kvs) => kvs.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String]
    }
    Role(
      name = str(j \ "name").getOrElse(
        throw new IllegalArgumentException("role json missing name")),
      privileges = privs)
  }
}

/** The user/role admin service bound to one catalog root — the Spark
  * analogue of the master's UserService/RoleService pair. All methods
  * are driver-side metadata ops (sidecar reads/writes), never Spark
  * jobs.
  */
final class Rbac(root: String) {
  import Rbac._

  private def userKey(name: String) = s"$root/_rbac/users/$name.json"
  private def roleKey(name: String) = s"$root/_rbac/roles/$name.json"

  /** The master bootstraps `root` from cluster config at startup —
    * CREATE-IF-ABSENT, like the reference (server.go:160-181 only
    * writes the root user when the store has none): a root password
    * rotated through [[updateUser]] survives restarts; re-running
    * `ensureRoot` never silently reverts it to the config value. Pass
    * `rotate = true` to force the config password explicitly (the
    * recover-a-lost-root path).
    *
    * Passwords are stored as plaintext — exactly the reference's
    * semantics (etcd-stored User JSON, cluster_api.go:141); hashing
    * here would silently diverge the wire contract (clients send the
    * config password verbatim). Callers who need at-rest protection
    * should point the catalog root at an encrypted filesystem, the
    * same posture as securing etcd. Comparisons are constant-time
    * ([[pwEquals]]), closing the timing channel the reference's `==`
    * leaves open without changing any accept/reject outcome.
    */
  def ensureRoot(password: String, rotate: Boolean = false): Unit =
    synchronized {
      if (rotate || !SidecarIO.exists(userKey(RootName)))
        SidecarIO.writeString(userKey(RootName), userToJson(
          User(RootName, Some(password), roleName = Some(RootName))))
    }

  // ── roles (role_service.go) ──

  /** CreateRole (role_service.go:38-68). */
  def createRole(role: Role): Unit = synchronized {
    role.validate()
    if (RoleMap.contains(role.name) || SidecarIO.exists(roleKey(role.name)))
      throw new IllegalArgumentException(s"role exist: ${role.name}")
    SidecarIO.writeString(roleKey(role.name), roleToJson(role))
  }

  /** QueryRole (role_service.go:100-125): built-ins resolve from the
    * static map before storage.
    */
  def queryRole(name: String): Role = synchronized {
    RoleMap.getOrElse(name, {
      if (!SidecarIO.exists(roleKey(name)))
        throw new NoSuchElementException(s"role not exist: $name")
      roleFromJson(SidecarIO.readString(roleKey(name)))
    })
  }

  /** DeleteRole (role_service.go:70-98). Built-ins resolve in QueryRole
    * but have no stored key, so deleting one is a no-op there; here it
    * is rejected outright — silently "deleting" an undeletable role is
    * the kind of success the caller acts on.
    */
  def deleteRole(name: String): Unit = synchronized {
    if (RoleMap.contains(name)) throw new IllegalArgumentException(
      s"can't delete builtin role: $name")
    queryRole(name)
    SidecarIO.delete(roleKey(name))
  }

  /** QueryAllRole (role_service.go:127-147) — stored roles; the
    * built-ins are a constant the caller already has (the reference
    * scans only the etcd prefix too).
    */
  def queryAllRoles(): Seq[Role] = synchronized {
    SidecarIO.listNames(s"$root/_rbac/roles").filter(_.endsWith(".json"))
      .sorted
      .map(f => roleFromJson(SidecarIO.readString(s"$root/_rbac/roles/$f")))
  }

  /** ChangeRolePrivilege (role_service.go:180-230): Grant merges the
    * request's (resource → privilege) entries over the stored role,
    * Revoke deletes the named resources. Built-in roles are immutable
    * (they have no stored key in the reference either).
    */
  def changeRolePrivilege(role: Role): Role = synchronized {
    role.validate()
    if (RoleMap.contains(role.name)) throw new IllegalArgumentException(
      s"can't change builtin role: ${role.name}")
    val op = role.operator.getOrElse(throw new IllegalArgumentException(
      s"role privilege operator type : , should be $OpGrant or $OpRevoke"))
    val old = queryRole(role.name)
    val merged =
      if (op == OpGrant) old.copy(privileges = old.privileges ++ role.privileges)
      else old.copy(privileges = old.privileges -- role.privileges.keys)
    SidecarIO.writeString(roleKey(role.name), roleToJson(merged))
    merged
  }

  // ── users (user_service.go) ──

  /** CreateUser (user_service.go:39-81). */
  def createUser(user: User, checkRoot: Boolean = true): Unit = synchronized {
    user.validate(checkRoot)
    val roleName = user.roleName.getOrElse(
      throw new IllegalArgumentException("role name is empty"))
    queryRole(roleName)
    if (user.password.isEmpty) throw new IllegalArgumentException(
      "password is empty")
    if (SidecarIO.exists(userKey(user.name)))
      throw new IllegalArgumentException(s"user exist: ${user.name}")
    SidecarIO.writeString(userKey(user.name), userToJson(user))
  }

  /** DeleteUser (user_service.go:83-114). */
  def deleteUser(name: String): Unit = synchronized {
    if (name.equalsIgnoreCase(RootName)) throw new IllegalArgumentException(
      "can't delete root user")
    if (!SidecarIO.exists(userKey(name)))
      throw new NoSuchElementException(s"user not exist: $name")
    SidecarIO.delete(userKey(name))
  }

  /** QueryUser (user_service.go:116-145): password never rides the
    * response; `checkRole` resolves the role inline.
    */
  def queryUser(name: String, checkRole: Boolean = true): UserRole =
    synchronized {
      val u = storedUser(name)
      val role =
        if (checkRole)
          queryRole(u.roleName.getOrElse(throw new IllegalArgumentException(
            s"get user:$name role: role name is empty")))
        else Role(u.roleName.getOrElse(""))
      UserRole(u.name, role)
    }

  /** QueryUserWithPassword (role_service.go:149-178) — the auth path's
    * lookup, password included.
    */
  def queryUserWithPassword(name: String): UserRole = synchronized {
    val u = storedUser(name)
    UserRole(u.name,
      queryRole(u.roleName.getOrElse(throw new IllegalArgumentException(
        s"get user:$name role: role name is empty"))),
      password = u.password)
  }

  /** QueryAllUser (user_service.go:147-174). */
  def queryAllUsers(): Seq[UserRole] = synchronized {
    SidecarIO.listNames(s"$root/_rbac/users").filter(_.endsWith(".json"))
      .sorted.map(f => f.stripSuffix(".json")).map(queryUser(_))
  }

  /** UpdateUser (user_service.go:176-246): role XOR password. A role
    * update must not carry passwords; a password update needs the old
    * password unless the authenticated caller is root resetting someone
    * else, and the new password must differ from the old.
    */
  def updateUser(user: User, authUser: String): Unit = synchronized {
    val old = storedUser(user.name)
    val merged = user.roleName match {
      case Some(rn) =>
        if (user.password.isDefined || user.oldPassword.isDefined)
          throw new IllegalArgumentException(
            "don't update role or password at same time")
        queryRole(rn)
        user.copy(password = old.password)
      case None =>
        if (authUser == RootName && user.name != RootName) {
          val np = user.password.getOrElse(
            throw new IllegalArgumentException("empty password"))
          if (pwEquals(old.password, np)) throw new IllegalArgumentException(
            "password is same with old password")
        } else {
          val np = user.password.getOrElse(
            throw new IllegalArgumentException("empty password or old password"))
          val op = user.oldPassword.getOrElse(
            throw new IllegalArgumentException("empty password or old password"))
          if (pwEquals(old.password, np)) throw new IllegalArgumentException(
            "password is same with old password")
          if (old.password.isDefined && !pwEquals(old.password, op))
            throw new IllegalArgumentException("old password is invalid")
        }
        user.copy(roleName = old.roleName, oldPassword = None)
    }
    SidecarIO.writeString(userKey(user.name), userToJson(merged))
  }

  // ── the middleware (cluster_api.go:101-160 / doc_http.go:69-123) ──

  /** BasicAuth: credential check then permission check, in the
    * middleware's order — wrong password and unknown user both fail
    * closed with the unauthorized error class (SecurityException here).
    */
  def authorize(name: String, password: String,
      endpoint: String, method: String): UserRole = synchronized {
    val ur = try queryUserWithPassword(name) catch {
      case e: Exception =>
        throw new SecurityException(s"auth header user $name is invalid", e)
    }
    if (!pwEquals(ur.password, password))
      throw new SecurityException("auth header password is invalid")
    if (!ur.role.hasPermission(endpoint, method))
      throw new SecurityException(
        s"role:${ur.role.name} don't have privilege for resource: " +
          parseResources(endpoint, method)._1)
    ur
  }

  /** Constant-time plaintext comparison (MessageDigest.isEqual): the
    * same accept/reject surface as the reference's string `==`
    * (cluster_api.go:141), minus the timing side channel.
    */
  private def pwEquals(stored: Option[String], supplied: String): Boolean =
    stored.exists(s => java.security.MessageDigest.isEqual(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      supplied.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  private def storedUser(name: String): User = {
    if (!SidecarIO.exists(userKey(name)))
      throw new NoSuchElementException(s"user not exist: $name")
    userFromJson(SidecarIO.readString(userKey(name)))
  }
}
